"""Static-shape tile binning for the Pallas rasterizer — TPU-profiled design.

The CUDA rasterizer radix-sorts (tile, depth) pairs on-GPU. On TPU the
XLA primitives have wildly different costs (measured on v5e, 50k gaussians,
512^2): non-stable 1.8M-key sort 5.7 ms, VMEM-resident row gathers ~4 ms,
but *stable* sorts ~10x slower, scalar gathers from HBM-resident tables
~40 ms, and scatter ~50 ms. This binning therefore uses ONE non-stable key
sort and only small-table lookups / row gathers, and NO scatter anywhere
(forward or backward):

1. depth-argsort the gaussians; n = position in depth order,
2. each gaussian emits up to ``win^2`` window candidates with key
   ``tile * N + n`` (invalid -> INT_MAX); one sort of the keys yields, per
   tile, a contiguous run in depth order — the key itself encodes
   (tile, gaussian) so no payload sort is needed,
3. per-tile counts come from a searchsorted over 257 boundaries; segments
   are re-laid chunk-aligned by computing, for every OUTPUT row, its source
   sorted-position (binary search over 256 starts + row gather) — placement
   is a gather, never a scatter,
4. the backward re-groups output-row cotangents per gaussian with one
   433k-key sort + uniform (N, win^2) padded segments, then a plain sum.

Overflow (window cap or pair budget) is counted and returned, never silent.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from sigman_release_tpu.ops.rasterizer.preprocess import ProjectedGaussians

# pair feature row layout (16 f32 lanes, last 6 padding)
F_MX, F_MY, F_CA, F_CB, F_CC, F_R, F_G, F_B, F_OPA, F_DEPTH = range(10)
PAIR_FEATS = 16

BIG = jnp.int32(2147483647)


class TileBinning(NamedTuple):
    """Chunk-aligned per-tile pair segments (see module docstring)."""

    pair_feats: jnp.ndarray   # [NC, 16, chunk] f32 chunk blocks
    pair_gauss: jnp.ndarray   # [P_alloc] int32 source gaussian (0 if pad)
    pair_valid: jnp.ndarray   # [P_alloc] bool
    tile_start: jnp.ndarray   # [n_tiles] int32 aligned segment start (pairs)
    tile_count: jnp.ndarray   # [n_tiles] int32 real pairs in the segment
    overflow: jnp.ndarray     # [] int32 — dropped (gaussian, tile) pairs


def _small_table_lookup(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [T] or [T,L] (T small), idx [...] -> table[idx] via masked reduce.

    XLA TPU lowers big scalar gathers poorly; a compare+select+sum over a
    <=256-entry table is a fused VPU loop instead. A trailing lane dim L
    fetches several tables in one pass.
    """
    t_axis = jnp.arange(table.shape[0], dtype=jnp.int32)
    flat = idx.reshape(-1, 1)
    if table.ndim == 1:
        out = jnp.sum(
            jnp.where(t_axis[None, :] == flat, table[None, :], 0), axis=1
        )
        return out.reshape(idx.shape)
    out = jnp.sum(
        jnp.where((t_axis[None, :] == flat)[..., None], table[None], 0),
        axis=1,
    )
    return out.reshape(idx.shape + (table.shape[1],))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _layout_pairs(rows16, gauss_row_f, valid_f, maxt, p_alloc):
    """Differentiable pair layout: output row r takes gaussian row
    ``gauss_row_f[r]`` when ``valid_f[r]`` (both float-encoded so the
    custom VJP has purely-float signatures). The VJP regroups output-row
    cotangents per gaussian without scatters."""
    n = rows16.shape[0]
    src = jnp.concatenate([rows16, jnp.zeros((1, rows16.shape[1]),
                                             rows16.dtype)])
    idx = jnp.where(valid_f > 0, gauss_row_f.astype(jnp.int32), n)
    return src[idx]


def _layout_fwd(rows16, gauss_row_f, valid_f, maxt, p_alloc):
    out = _layout_pairs(rows16, gauss_row_f, valid_f, maxt, p_alloc)
    return out, (gauss_row_f, valid_f, rows16.shape[0])


def _layout_bwd(maxt, p_alloc, res, g):
    """Group g's rows by gaussian with one sort; uniform maxt-padded segments
    turn the variable-length reduction into a reshape+sum (no scatter)."""
    gauss_row_f, valid_f, n = res
    r_idx = jnp.arange(p_alloc, dtype=jnp.int32)
    key = jnp.where(valid_f > 0, gauss_row_f.astype(jnp.int32), n)
    key_sorted, r_sorted = lax.sort_key_val(key, r_idx)
    starts = jnp.searchsorted(
        key_sorted, jnp.arange(n, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    ends = jnp.searchsorted(
        key_sorted, jnp.arange(1, n + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    offs = jnp.arange(maxt, dtype=jnp.int32)
    pos = starts[:, None] + offs[None, :]
    in_seg = pos < ends[:, None]
    pos = jnp.clip(pos, 0, p_alloc - 1)
    rows = r_sorted[pos.reshape(-1)]
    rows = jnp.where(in_seg.reshape(-1), rows, p_alloc)
    gpad = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)])
    d = gpad[rows].reshape(n, maxt, -1)
    return (jnp.sum(d, axis=1), jnp.zeros_like(gauss_row_f),
            jnp.zeros_like(valid_f))


_layout_pairs.defvjp(_layout_fwd, _layout_bwd)


@jax.custom_vjp
def _perm_gather(x, perm, inv_perm):
    """x[perm] whose VJP is the inverse-permutation gather (no scatter)."""
    return x[perm]


def _perm_gather_fwd(x, perm, inv_perm):
    return x[perm], inv_perm


def _perm_gather_bwd(inv_perm, g):
    return (g[inv_perm], None, None)


_perm_gather.defvjp(_perm_gather_fwd, _perm_gather_bwd)


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
    n = proj.mean2d.shape[0]
    ntx = -(-img_w // tile_size)
    nty = -(-img_h // tile_size)
    n_tiles = ntx * nty
    win = int(math.isqrt(max_tiles_per_gaussian))
    assert win * win == max_tiles_per_gaussian, "window must be square"
    maxt = win * win
    if pair_budget is None:
        pair_budget = 8 * n
    p_alloc = -(-pair_budget // chunk) * chunk + n_tiles * chunk
    assert (n_tiles + 1) * n < 2 ** 31, "key overflows int32"

    # ---- 1. depth order ----------------------------------------------------
    perm = jnp.argsort(
        jnp.where(proj.valid, proj.depth, jnp.inf)
    ).astype(jnp.int32)
    inv_perm = jnp.argsort(perm).astype(jnp.int32)

    # ONE 16-lane-aligned row (narrow row gathers lower ~10x worse on TPU):
    # lanes 0-9 = kernel features, lane 10 = radius, lane 11 = validity
    feats16 = jnp.stack(
        [proj.mean2d[:, 0], proj.mean2d[:, 1],
         proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
         colors[:, 0], colors[:, 1], colors[:, 2],
         jnp.where(proj.valid, opacity, 0.0),
         proj.depth,
         proj.radius, proj.valid.astype(jnp.float32),
         jnp.zeros_like(proj.depth), jnp.zeros_like(proj.depth),
         jnp.zeros_like(proj.depth), jnp.zeros_like(proj.depth)],
        axis=-1,
    ).astype(jnp.float32)                                   # [N,16]
    sorted16 = _perm_gather(feats16, perm, inv_perm)

    mean2d = sorted16[:, 0:2]
    radius = sorted16[:, 10]
    valid = sorted16[:, 11] > 0.5

    # ---- 2. window candidates + one key sort -------------------------------
    x0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / tile_size), 0, ntx)
    y0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / tile_size), 0, nty)
    x1 = jnp.clip(jnp.floor((mean2d[:, 0] + radius) / tile_size) + 1, 0, ntx)
    y1 = jnp.clip(jnp.floor((mean2d[:, 1] + radius) / tile_size) + 1, 0, nty)
    x0, y0, x1, y1 = (a.astype(jnp.int32) for a in (x0, y0, x1, y1))
    x1c = jnp.minimum(x1, x0 + win)
    y1c = jnp.minimum(y1, y0 + win)
    overflow = jnp.sum(
        jnp.where(valid, (x1 - x0) * (y1 - y0) - (x1c - x0) * (y1c - y0), 0)
    ).astype(jnp.int32)

    li = jnp.arange(maxt, dtype=jnp.int32)
    lx = li % win
    ly = li // win
    tx = x0[:, None] + lx[None]
    ty = y0[:, None] + ly[None]
    cand_ok = (tx < x1c[:, None]) & (ty < y1c[:, None]) & valid[:, None]
    tile_id = ty * ntx + tx
    n_idx = jnp.arange(n, dtype=jnp.int32)
    keys = jnp.where(cand_ok, tile_id * n + n_idx[:, None], BIG).reshape(-1)
    keys_sorted = lax.sort(keys)                             # ONE sort

    # ---- 3. per-tile segments ----------------------------------------------
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * n
    raw_start = jnp.searchsorted(keys_sorted, bounds, side="left").astype(
        jnp.int32
    )
    counts = raw_start[1:] - raw_start[:-1]                  # [T]
    raw_start = raw_start[:-1]
    seg_pad = -(-counts // chunk) * chunk
    seg_end = jnp.cumsum(seg_pad)
    aligned_start = (seg_end - seg_pad).astype(jnp.int32)
    fits = seg_end <= p_alloc
    overflow = overflow + jnp.sum(jnp.where(fits, 0, counts)).astype(jnp.int32)
    tile_count = jnp.where(fits, counts, 0).astype(jnp.int32)
    tile_start = jnp.where(fits, aligned_start, 0).astype(jnp.int32)

    # ---- 4. gather-based aligned placement ---------------------------------
    r_idx = jnp.arange(p_alloc, dtype=jnp.int32)
    # which tile owns output row r (binary search over 256 aligned starts)
    t_of_r = (
        jnp.searchsorted(aligned_start, r_idx, side="right") - 1
    ).astype(jnp.int32)
    t_of_r = jnp.clip(t_of_r, 0, n_tiles - 1)
    packed = _small_table_lookup(
        jnp.stack([aligned_start, raw_start, tile_count], axis=-1), t_of_r
    )
    astart_r, rstart_r, count_r = packed[:, 0], packed[:, 1], packed[:, 2]
    r_off = r_idx - astart_r
    valid_out = r_off < count_r
    sorted_pos = jnp.clip(rstart_r + r_off, 0, keys.shape[0] - 1)
    key_at = keys_sorted[sorted_pos]                         # row gather
    gauss_row = key_at % n                                   # depth-order row

    # zero the aux lanes before placement (the kernel contract reserves them)
    lane = jnp.arange(PAIR_FEATS)
    rows16 = jnp.where(lane[None, :] < 10, sorted16, 0.0)
    placed = _layout_pairs(
        rows16, gauss_row.astype(jnp.float32),
        valid_out.astype(jnp.float32), maxt, p_alloc,
    )
    feats = placed.reshape(p_alloc // chunk, chunk, PAIR_FEATS)
    feats = jnp.swapaxes(feats, 1, 2)                        # [NC,16,chunk]

    perm_pad = jnp.concatenate([perm, jnp.zeros((1,), jnp.int32)])
    pair_gauss = perm_pad[jnp.where(valid_out, gauss_row, n)]
    pair_gauss = jnp.where(valid_out, pair_gauss, 0)

    return TileBinning(
        feats, pair_gauss, valid_out, tile_start, tile_count, overflow
    )
