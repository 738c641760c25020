from dfmdock_tpu.train.losses import loss_fn, interface_labels
from dfmdock_tpu.train.trainer import Trainer, make_optimizer, train_step
