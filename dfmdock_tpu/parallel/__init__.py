from dfmdock_tpu.parallel.mesh import (
    make_mesh,
    make_dp_train_step,
    make_pose_parallel_sampler,
)
