from dfmdock_tpu.data.batching import pad_complex, round_up
