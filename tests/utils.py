"""Shared fixtures: random Gaussian clouds + camera rigs for renderer tests."""

from __future__ import annotations

import math

import numpy as np

from sigman_release_tpu.geometry.cameras import (
    camera_bundle,
    orbit_camera,
    projection_matrix,
)
from sigman_release_tpu.ops.rotations import quaternion_to_matrix

FOV = 0.8712626851529752
ZNEAR, ZFAR = 0.1, 100.0


def random_gaussians(n: int, seed: int = 0, spread: float = 0.5,
                     scale_lo: float = 0.02, scale_hi: float = 0.08):
    """Random cloud near the origin. Returns dict of float32 numpy arrays."""
    rng = np.random.default_rng(seed)
    means = rng.normal(0.0, spread, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    rots = np.asarray(quaternion_to_matrix(quats))
    scales = rng.uniform(scale_lo, scale_hi, (n, 3)).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    opacity = rng.uniform(0.2, 0.95, (n,)).astype(np.float32)
    return {
        "means3d": means,
        "scales": scales,
        "rotations": rots,
        "colors": colors,
        "opacity": opacity,
    }


def orbit_rig(n_views: int = 4, radius: float = 1.5, elevation: float = 0.0):
    """(cam_view [V,4,4], cam_view_proj [V,4,4], cam_pos [V,3]) float32."""
    proj = projection_matrix(ZNEAR, ZFAR, FOV, FOV)
    c2ws = np.stack(
        [orbit_camera(elevation, 360.0 * i / n_views, radius) for i in range(n_views)]
    )
    return camera_bundle(c2ws, proj)


def tan_half_fov() -> float:
    return math.tan(0.5 * FOV)
