from .fusion import (
    LidarFusion,
    fuse_stacked,
    rotation_matrix_2d,
    stack_extrinsics,
    translation_matrix,
)
