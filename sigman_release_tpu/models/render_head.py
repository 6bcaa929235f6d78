"""Standalone 14-channel Gaussian head (free Gaussians, quaternion rotation).

Equivalent of the reference's ``Render`` module
(/root/reference/core/modules/DiT_utils.py:832-881): decode a [B, 14, H, W]
feature map into raw Gaussians with activations pos=clamp(-1,1),
opacity=sigmoid, scale=0.1*softplus, rotation=normalized quaternion,
rgb=0.5*tanh+0.5. Unlike the template-anchored VAE path, these Gaussians are
free in space, so the rasterizer consumes their covariance directly from
(scale, quaternion).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sigman_release_tpu.ops.rotations import quaternion_to_matrix
from sigman_release_tpu.ops.rasterizer.preprocess import build_cov3d


class RenderHead:
    """Pure functions — no learned parameters."""

    @staticmethod
    def decode(x: jnp.ndarray) -> dict:
        """x [B,14,H,W] -> dict of per-Gaussian arrays [B,N,*]."""
        B = x.shape[0]
        x = jnp.moveaxis(x, 1, -1).reshape(B, -1, 14)
        pos = jnp.clip(x[..., 0:3], -1.0, 1.0)
        opacity = jax.nn.sigmoid(x[..., 3:4])
        scale = 0.1 * jax.nn.softplus(x[..., 4:7])
        rotation = x[..., 7:11]
        rotation = rotation / jnp.maximum(
            jnp.linalg.norm(rotation, axis=-1, keepdims=True), 1e-12
        )
        rgb = 0.5 * jnp.tanh(x[..., 11:14]) + 0.5
        return {
            "position": pos,
            "opacity": opacity[..., 0],
            "scale": scale,
            "rotation": rotation,
            "rgb": rgb,
        }

    @staticmethod
    def covariances(gaussians: dict) -> jnp.ndarray:
        """[B,N,6] packed covariance from scale + quaternion."""
        rots = quaternion_to_matrix(gaussians["rotation"], normalize=False)
        return jax.vmap(build_cov3d)(gaussians["scale"], rots)
