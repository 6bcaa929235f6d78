"""Static-shape tile binning for the Pallas rasterizer.

The CUDA rasterizer builds per-tile Gaussian lists with a prefix-sum +
radix-sort over dynamically sized (tile, depth)-keyed pairs. TPU/XLA needs
static shapes, so we bin differently (SURVEY.md §7 hard part 2):

* every Gaussian emits up to ``max_tiles_per_gaussian`` candidate (tile, pair)
  slots from a fixed local window anchored at its screen AABB,
* pairs are keyed by ``tile_id * N_pad + depth_rank`` and sorted once with
  ``jax.lax.sort`` — depth rank inside a tile key reproduces the CUDA
  per-tile front-to-back order,
* per-tile segment starts come from a searchsorted over the sorted keys,
* per-pair feature rows (mean2d, conic, color, opacity, depth) are gathered
  into a dense ``[P_pad, 16]`` f32 matrix the kernel can DMA in chunks.

Overflow (a Gaussian overlapping more tiles than the window) is *counted* and
returned, never silently dropped — callers can widen the window.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from sigman_release_tpu.ops.rasterizer.preprocess import ProjectedGaussians

# pair feature row layout (16 f32 lanes, last 6 padding)
F_MX, F_MY, F_CA, F_CB, F_CC, F_R, F_G, F_B, F_OPA, F_DEPTH = range(10)
PAIR_FEATS = 16


class TileBinning(NamedTuple):
    """Chunk-aligned per-tile pair segments.

    Each tile's segment starts at a multiple of ``chunk`` so the kernel's
    fixed-size chunk DMAs (forward reads, backward gradient writes) never
    cross tile boundaries. Rows beyond ``tile_count`` within a segment are
    zero padding.
    """

    pair_feats: jnp.ndarray   # [P_aligned, 16] f32 gathered per-pair data
    pair_gauss: jnp.ndarray   # [P_aligned] int32 source gaussian (0 if pad)
    pair_valid: jnp.ndarray   # [P_aligned] bool
    tile_start: jnp.ndarray   # [n_tiles] int32 aligned segment start
    tile_count: jnp.ndarray   # [n_tiles] int32 real pairs in the segment
    overflow: jnp.ndarray     # [] int32 — dropped (gaussian, tile) pairs


def bin_gaussians(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,      # [N,3]
    opacity: jnp.ndarray,     # [N]
    img_h: int,
    img_w: int,
    tile_size: int = 32,
    max_tiles_per_gaussian: int = 36,
    chunk: int = 128,
    pair_budget: int | None = None,
) -> TileBinning:
    """Bin projected Gaussians into per-tile depth-ordered pair segments.

    ``pair_budget`` caps the total number of (gaussian, tile) pairs kept
    (default ``8 * N``). Truncation keeps the smallest sort keys — pairs of
    the highest-index tiles are dropped first — and is reported via
    ``overflow`` so callers can raise the budget instead of silently
    mis-rendering.
    """
    n = proj.mean2d.shape[0]
    ntx = -(-img_w // tile_size)
    nty = -(-img_h // tile_size)
    n_tiles = ntx * nty
    win = int(math.isqrt(max_tiles_per_gaussian))
    assert win * win == max_tiles_per_gaussian, "window must be square"
    maxt = win * win

    mean2d, radius, valid = proj.mean2d, proj.radius, proj.valid
    depth = proj.depth

    # screen AABB in tile units (matches CUDA getRect clamping)
    x0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / tile_size), 0, ntx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / tile_size), 0, nty).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mean2d[:, 0] + radius) / tile_size) + 1, 0, ntx).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((mean2d[:, 1] + radius) / tile_size) + 1, 0, nty).astype(jnp.int32)
    span_x = x1 - x0
    span_y = y1 - y0
    touched = span_x * span_y
    overflow = jnp.sum(
        jnp.where(valid, jnp.maximum(touched - maxt, 0), 0)
    ).astype(jnp.int32)

    # front-to-back rank (global depth sort; stable => deterministic ties)
    order = jnp.argsort(jnp.where(valid, depth, jnp.inf), stable=True)
    rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))

    # candidate tiles from a win x win local window clamped to the AABB
    li = jnp.arange(maxt, dtype=jnp.int32)
    lx = li % win
    ly = li // win
    # clamp window to the span so wide gaussians keep their top-left tiles
    tx = x0[:, None] + lx[None, :]                       # [N, maxt]
    ty = y0[:, None] + ly[None, :]
    cand_ok = (
        valid[:, None]
        & (lx[None, :] < jnp.minimum(span_x, win)[:, None])
        & (ly[None, :] < jnp.minimum(span_y, win)[:, None])
    )
    tile_id = ty * ntx + tx                              # [N, maxt]

    n_pad = n  # rank < n
    key_max = jnp.int32(2147483647)
    key = jnp.where(
        cand_ok,
        tile_id * n_pad + rank[:, None],
        key_max,
    ).reshape(-1)
    assert n_tiles * n_pad < 2**31, "pair key overflows int32; shard views"
    gauss_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, maxt)
    ).reshape(-1)

    key_sorted, idx_sorted = lax.sort_key_val(key, gauss_idx)
    if pair_budget is None:
        pair_budget = 8 * n
    pair_budget = min(pair_budget, key.shape[0])
    n_kept = pair_budget
    total_valid = jnp.sum(key_sorted < key_max).astype(jnp.int32)
    overflow = overflow + jnp.maximum(total_valid - n_kept, 0)
    key_sorted = key_sorted[:n_kept]
    idx_sorted = idx_sorted[:n_kept]
    sorted_valid = key_sorted < key_max

    # segment starts per tile: first key with tile_id >= t
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * n_pad
    starts = jnp.searchsorted(key_sorted, bounds, side="left").astype(jnp.int32)
    raw_start = starts[:-1]
    tile_count = starts[1:] - starts[:-1]

    # chunk-aligned layout: scatter each sorted pair to
    # aligned_start[tile] + offset-in-segment
    seg_pad = -(-tile_count // chunk) * chunk              # ceil to chunk
    aligned_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(seg_pad)[:-1].astype(jnp.int32)]
    )
    p_aligned = n_kept + n_tiles * chunk                   # static upper bound
    sorted_tile = jnp.clip(key_sorted // n_pad, 0, n_tiles - 1)
    pos = jnp.arange(n_kept, dtype=jnp.int32)
    new_pos = jnp.where(
        sorted_valid,
        aligned_start[sorted_tile] + (pos - raw_start[sorted_tile]),
        p_aligned,                                         # dropped by scatter
    )

    safe_idx = jnp.where(sorted_valid, idx_sorted, 0)
    cols = jnp.stack(
        [mean2d[safe_idx, 0], mean2d[safe_idx, 1],
         proj.conic[safe_idx, 0], proj.conic[safe_idx, 1],
         proj.conic[safe_idx, 2],
         colors[safe_idx, 0], colors[safe_idx, 1], colors[safe_idx, 2],
         jnp.where(sorted_valid, opacity[safe_idx], 0.0),
         depth[safe_idx]],
        axis=-1,
    ).astype(jnp.float32)                                  # [P_sorted, 10]
    cols = jnp.pad(cols, ((0, 0), (0, PAIR_FEATS - cols.shape[1])))

    feats = jnp.zeros((p_aligned, PAIR_FEATS), jnp.float32)
    feats = feats.at[new_pos].set(cols, mode="drop")
    pair_gauss = jnp.zeros((p_aligned,), jnp.int32).at[new_pos].set(
        safe_idx, mode="drop"
    )
    pair_valid = jnp.zeros((p_aligned,), bool).at[new_pos].set(
        sorted_valid, mode="drop"
    )
    return TileBinning(
        feats, pair_gauss, pair_valid, aligned_start, tile_count, overflow
    )
