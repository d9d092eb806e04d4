from bundletrack_tpu.geometry.se3 import (
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    se3_inverse,
    se3_compose,
    transform_points,
    transform_normals,
    rotation_geodesic_distance,
    hat,
    vee,
)
from bundletrack_tpu.geometry.robust import huber, huber_weight
from bundletrack_tpu.geometry.procrustes import (
    kabsch,
    rigid_from_three_points,
    umeyama_rigid,
)
from bundletrack_tpu.geometry.camera import (
    project,
    unproject,
    scale_intrinsics,
    bilinear_sample,
)

__all__ = [
    "so3_exp",
    "so3_log",
    "se3_exp",
    "se3_log",
    "se3_inverse",
    "se3_compose",
    "transform_points",
    "transform_normals",
    "rotation_geodesic_distance",
    "hat",
    "vee",
    "huber",
    "huber_weight",
    "kabsch",
    "rigid_from_three_points",
    "umeyama_rigid",
    "project",
    "unproject",
    "scale_intrinsics",
    "bilinear_sample",
]
