from dfmdock_tpu.eval.metrics import compute_metrics
