"""Bilinear / trilinear grid sampling with torch ``F.grid_sample`` semantics.

The pipeline needs two flavours:
* 2D bilinear, ``align_corners=False``, border padding — fetching per-Gaussian
  attributes from UV maps (/root/reference/core/modules/autoencoder.py:301),
* 3D trilinear, ``align_corners=True``, border padding — querying the LBS
  weight voxel (/root/reference/.../deformer_smplx.py:107-112).

Implemented as pure gathers + lerps so XLA fuses them; differentiable w.r.t.
both input and grid.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size, align_corners):
    """[-1,1] -> pixel coordinates (float)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_2d(inp: jnp.ndarray, grid: jnp.ndarray,
                   align_corners: bool = False) -> jnp.ndarray:
    """inp [C,H,W], grid [..., 2] (x,y in [-1,1]) -> [C, ...]; border padding."""
    C, H, W = inp.shape
    gshape = grid.shape[:-1]
    g = grid.reshape(-1, 2)
    x = _unnormalize(g[:, 0], W, align_corners)
    y = _unnormalize(g[:, 1], H, align_corners)
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = x - x0
    wy = y - y0
    x0i, x1i, y0i, y1i = (a.astype(jnp.int32) for a in (x0, x1, y0, y1))

    def gather(yi, xi):  # [C, P]
        return inp[:, yi, xi]

    v = (gather(y0i, x0i) * (1 - wx) * (1 - wy)
         + gather(y0i, x1i) * wx * (1 - wy)
         + gather(y1i, x0i) * (1 - wx) * wy
         + gather(y1i, x1i) * wx * wy)
    return v.reshape((C,) + gshape)


def grid_sample_3d(inp: jnp.ndarray, grid: jnp.ndarray,
                   align_corners: bool = True) -> jnp.ndarray:
    """inp [C,D,H,W], grid [..., 3] (x,y,z in [-1,1] indexing W,H,D) -> [C, ...]."""
    C, D, H, W = inp.shape
    gshape = grid.shape[:-1]
    g = grid.reshape(-1, 3)
    x = jnp.clip(_unnormalize(g[:, 0], W, align_corners), 0.0, W - 1.0)
    y = jnp.clip(_unnormalize(g[:, 1], H, align_corners), 0.0, H - 1.0)
    z = jnp.clip(_unnormalize(g[:, 2], D, align_corners), 0.0, D - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    z0 = jnp.clip(jnp.floor(z), 0, D - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    z1 = jnp.clip(z0 + 1, 0, D - 1)
    wx, wy, wz = x - x0, y - y0, z - z0
    x0i, x1i, y0i, y1i, z0i, z1i = (
        a.astype(jnp.int32) for a in (x0, x1, y0, y1, z0, z1)
    )

    def gather(zi, yi, xi):  # [C, P]
        return inp[:, zi, yi, xi]

    v = (
        gather(z0i, y0i, x0i) * (1 - wx) * (1 - wy) * (1 - wz)
        + gather(z0i, y0i, x1i) * wx * (1 - wy) * (1 - wz)
        + gather(z0i, y1i, x0i) * (1 - wx) * wy * (1 - wz)
        + gather(z0i, y1i, x1i) * wx * wy * (1 - wz)
        + gather(z1i, y0i, x0i) * (1 - wx) * (1 - wy) * wz
        + gather(z1i, y0i, x1i) * wx * (1 - wy) * wz
        + gather(z1i, y1i, x0i) * (1 - wx) * wy * wz
        + gather(z1i, y1i, x1i) * wx * wy * wz
    )
    return v.reshape((C,) + gshape)
