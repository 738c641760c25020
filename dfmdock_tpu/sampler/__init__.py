from dfmdock_tpu.sampler.em import EMSampler
from dfmdock_tpu.sampler.picard import PicardSampler
