from dfmdock_tpu.diffusion.r3 import R3Diffuser
from dfmdock_tpu.diffusion.so3 import SO3Diffuser
