from dfmdock_tpu.sampler.em import EMSampler
