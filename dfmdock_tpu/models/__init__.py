from dfmdock_tpu.models.score_net import ScoreNet
