"""Pinhole ray generation + Plücker embedding (JAX).

Semantics follow the reference's get_rays (/root/reference/core/utils.py:10-42):
pixel-center offsets of +0.5, focal = h/2 / tan(fovy/2) with fovy in *degrees*
at the call site there; here fovy is radians for consistency with Config.
"""

from __future__ import annotations

import jax.numpy as jnp


def get_rays(c2w: jnp.ndarray, h: int, w: int, fovy: float, opengl: bool = False):
    """Rays for every pixel. c2w: [4,4]. Returns (rays_o, rays_d): [h,w,3]."""
    x = jnp.arange(w, dtype=jnp.float32)
    y = jnp.arange(h, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    cx, cy = w * 0.5, h * 0.5
    focal = h * 0.5 / jnp.tan(0.5 * fovy)
    sign = -1.0 if opengl else 1.0
    dirs = jnp.stack(
        [(xx - cx + 0.5) / focal, (yy - cy + 0.5) / focal * sign,
         jnp.full_like(xx, sign)],
        axis=-1,
    )  # [h,w,3] camera-space
    rays_d = dirs @ c2w[:3, :3].T
    rays_d = rays_d / jnp.maximum(
        jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-20
    )
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def plucker_rays(c2w: jnp.ndarray, h: int, w: int, fovy: float,
                 opengl: bool = False) -> jnp.ndarray:
    """6-channel Plücker embedding [h,w,6] = [o x d, d]."""
    rays_o, rays_d = get_rays(c2w, h, w, fovy, opengl)
    return jnp.concatenate([jnp.cross(rays_o, rays_d), rays_d], axis=-1)
