"""Dense golden-model renderer: per-pixel alpha compositing over all Gaussians.

O(pixels x N) — slow, but CPU-runnable, fully differentiable via autodiff, and
numerically faithful to the CUDA tile rasterizer's compositing rules
(alpha clamp at 0.99, 1/255 contribution floor, T < 1e-4 early stop —
``renderCUDA`` of ``diff_gaussian_rasterization``). This is the unit-test
oracle for the Pallas kernels (SURVEY.md §7 step 2a).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sigman_release_tpu.ops.rasterizer.preprocess import project_gaussians

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


@functools.partial(
    jax.jit, static_argnames=("img_h", "img_w", "row_block", "tile_size")
)
def render_dense(
    means3d: jnp.ndarray,        # [N,3]
    cov3d: jnp.ndarray,          # [N,6]
    colors: jnp.ndarray,         # [N,3]
    opacity: jnp.ndarray,        # [N] or [N,1]
    cam_view: jnp.ndarray,       # [4,4]
    cam_view_proj: jnp.ndarray,  # [4,4]
    tan_half_fovx: float,
    tan_half_fovy: float,
    img_h: int,
    img_w: int,
    bg_color: jnp.ndarray,       # [3]
    row_block: int = 16,
    tile_size: int = 32,
):
    """Render one view. Returns dict with image [3,H,W], alpha/depth [1,H,W].

    ``tile_size`` replicates the tile-rect cutoff of the CUDA rasterizer
    (a gaussian touches exactly the pixels of tiles its 3-sigma screen rect
    overlaps — tails beyond the rect are cut). Pass 0 to disable and
    composite every gaussian at every pixel.
    """
    opacity = opacity.reshape(-1)
    proj = project_gaussians(
        means3d, cov3d, cam_view, cam_view_proj,
        tan_half_fovx, tan_half_fovy, img_h, img_w,
    )

    # global front-to-back order (stable for deterministic tie behaviour)
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf), stable=True)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    depth = proj.depth[order]
    valid = proj.valid[order]
    radius = proj.radius[order]
    col = colors[order].astype(jnp.float32)
    opa = jnp.where(valid, opacity[order].astype(jnp.float32), 0.0)

    xs = jnp.arange(img_w, dtype=jnp.float32)

    # evaluate in row blocks to bound the [rows, W, N] intermediate
    def block_fn(y_rows):
        # y_rows: [R] row indices
        px = xs[None, :, None]                      # [1,W,1]
        py = y_rows[:, None, None].astype(jnp.float32)  # [R,1,1]
        dx = mean2d[None, None, :, 0] - px          # [R,W,N] via broadcast
        dy = mean2d[None, None, :, 1] - py
        power = (
            -0.5 * (conic[None, None, :, 0] * dx * dx
                    + conic[None, None, :, 2] * dy * dy)
            - conic[None, None, :, 1] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, opa[None, None, :] * jnp.exp(power))
        alpha = jnp.where(power > 0.0, 0.0, alpha)          # CUDA skips power>0
        alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
        if tile_size:
            # tile-rect cutoff (see docstring)
            x0 = jnp.floor((mean2d[:, 0] - radius) / tile_size)
            x1 = jnp.floor((mean2d[:, 0] + radius) / tile_size) + 1
            y0 = jnp.floor((mean2d[:, 1] - radius) / tile_size)
            y1 = jnp.floor((mean2d[:, 1] + radius) / tile_size) + 1
            tx = jnp.floor(px / tile_size)                  # [1,W,1]
            ty = jnp.floor(py / tile_size)                  # [R,1,1]
            in_rect = ((tx >= x0[None, None]) & (tx < x1[None, None])
                       & (ty >= y0[None, None]) & (ty < y1[None, None]))
            alpha = jnp.where(in_rect, alpha, 0.0)
        one_m = 1.0 - alpha
        t_inc = jnp.cumprod(one_m, axis=-1)                 # inclusive
        contrib = t_inc >= T_EPS                            # early-stop rule
        t_exc = jnp.concatenate(
            [jnp.ones_like(t_inc[..., :1]), t_inc[..., :-1]], axis=-1
        )
        w = jnp.where(contrib, alpha * t_exc, 0.0)          # [R,W,N]
        t_final = jnp.prod(jnp.where(contrib, one_m, 1.0), axis=-1)  # [R,W]
        rgb = jnp.einsum("rwn,nc->crw", w, col)
        d = jnp.einsum("rwn,n->rw", w, depth)
        a = 1.0 - t_final
        rgb = rgb + t_final[None] * bg_color[:, None, None]
        return rgb, d, a

    n_blocks = -(-img_h // row_block)
    rows = jnp.arange(n_blocks * row_block) % img_h
    rows = rows.reshape(n_blocks, row_block)
    rgb, d, a = jax.lax.map(block_fn, rows)
    rgb = jnp.moveaxis(rgb, 1, 0).reshape(3, -1, img_w)[:, :img_h]
    d = d.reshape(-1, img_w)[:img_h]
    a = a.reshape(-1, img_w)[:img_h]
    return {
        "image": jnp.clip(rgb, 0.0, 1.0),
        "alpha": a[None],
        "depth": d[None],
    }
