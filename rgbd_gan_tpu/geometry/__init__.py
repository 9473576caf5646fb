from .camera import camera_matrices, camera_matrices_np, theta_to_9dof
from .prior import CameraParamPrior
from .warp import (
    bilinear_sample,
    intrinsics,
    inv_warp,
    pixel_grid,
    relative_pose,
    rotate_consistency_loss,
    warp,
)

__all__ = [
    "camera_matrices",
    "camera_matrices_np",
    "theta_to_9dof",
    "CameraParamPrior",
    "intrinsics",
    "pixel_grid",
    "warp",
    "inv_warp",
    "bilinear_sample",
    "relative_pose",
    "rotate_consistency_loss",
]
