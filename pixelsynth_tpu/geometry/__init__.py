from pixelsynth_tpu.geometry.cameras import (
    euler_to_rotation_matrix,
    get_camera_matrices,
    get_deltas,
    invert_K,
    invert_RT,
    jitter_quaternions,
)
from pixelsynth_tpu.geometry.paths import (
    ROTVECS,
    DIRECTION_ORDER,
    get_rt_from_rot,
    num_split_for_direction,
)
from pixelsynth_tpu.geometry.projection import (
    lift_to_cloud,
    ndc_grid,
    project_points,
    reproject_cloud,
)

__all__ = [
    "euler_to_rotation_matrix",
    "get_camera_matrices",
    "get_deltas",
    "invert_K",
    "invert_RT",
    "jitter_quaternions",
    "ROTVECS",
    "DIRECTION_ORDER",
    "get_rt_from_rot",
    "num_split_for_direction",
    "project_points",
    "reproject_cloud",
    "lift_to_cloud",
    "ndc_grid",
]
