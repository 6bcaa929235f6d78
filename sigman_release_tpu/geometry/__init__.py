from sigman_release_tpu.geometry.cameras import (
    projection_matrix,
    look_at,
    orbit_camera,
    camera_bundle,
    intrinsics_projection_matrix,
)
from sigman_release_tpu.geometry.rays import get_rays, plucker_rays
