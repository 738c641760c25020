from dfmdock_tpu.geom.rotations import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    quaternion_to_matrix,
    matrix_to_quaternion,
    axis_angle_to_quaternion,
    quaternion_to_axis_angle,
    matrix_to_rotation_6d,
    rotation_6d_to_matrix,
    random_rotation_matrix,
    kabsch,
    compose_axis_angle,
)
