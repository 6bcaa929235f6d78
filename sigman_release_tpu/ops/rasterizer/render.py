"""Public differentiable rasterizer API (Pallas path).

``rasterize`` is the TPU-native replacement for the reference's
``GaussianRenderer.render`` (/root/reference/core/gaussians/gs.py:49-117),
with the B x V python loop of sequential CUDA launches replaced by ONE
fused pipeline: batched projection/EWA (XLA), batched tile binning (XLA sort),
and a single Pallas kernel whose grid covers every (batch, view, tile).

Differentiation: projection, binning gathers, and background compositing are
plain JAX (autodiff); only the tile compositing loop carries a custom VJP
(pallas forward/backward kernels). The VJP of the binning *gather* is exactly
the pair->gaussian scatter-add, so no explicit segment-sum is needed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sigman_release_tpu.ops.rasterizer import binning as binning_lib
from sigman_release_tpu.ops.rasterizer import pallas_backward, pallas_forward
from sigman_release_tpu.ops.rasterizer.pallas_forward import TILE
from sigman_release_tpu.ops.rasterizer.preprocess import project_gaussians


class RasterizeConfig(NamedTuple):
    """Static kernel parameters (hashable — used as nondiff custom_vjp arg)."""

    img_h: int = 512
    img_w: int = 512
    tan_half_fovx: float = 0.4654
    tan_half_fovy: float = 0.4654
    chunk: int = 128
    max_tiles_per_gaussian: int = 9
    pair_budget_factor: int = 5
    # side of the top-K fallback window (tiles): gaussians whose bbox span
    # exceeds the base window emit their remaining tiles from this second
    # candidate set; raise it if the overflow log shows real drops (huge
    # splats early in training, extreme close-ups)
    big_win: int = 6
    interpret: bool = False
    # backward pair-gradient stream in bf16: ~4x faster gradient regroup
    # (the random row gather from the budget-sized grad table is the
    # dominant backward cost; bf16 rows hit a much faster gather path and
    # halve the kernel's write traffic). Per-pair grads round to bf16
    # (~0.4% rel) before the f32 window sums; set False for strict-parity
    # f32 accumulation (the CUDA reference accumulates f32).
    grad_stream_bf16: bool = True
    # MXU pass count of the kernels' prefix-sum triangular matmuls (~2/3 of
    # per-chunk kernel FLOPs): "f32" (strict parity), "bf16x2" (hi+lo split,
    # ~2^-16 relative rounding — indistinguishable at image scale), "bf16"
    # (single pass, ~2^-9 rounding of log-transmittance / grad prefixes).
    # See pallas_forward._cumsum0 and tests/test_rasterizer_precision.py.
    cumsum_mode: str = "f32"
    # pixel tile side (16 or 32). Smaller tiles quarter the per-chunk
    # [K, tile^2] kernel work and stop-saturate at finer granularity, at
    # the cost of more (gaussian, tile) pairs; max_tiles_per_gaussian /
    # big_win are in TILES and should widen as the tile shrinks (a 16px
    # base window covers half the pixels of the 32px one).
    tile: int = TILE
    # opacity-exact cutoff radius (binning.bin_gaussians): output becomes
    # the pure alpha-floor rule, independent of tile size — a strict
    # improvement over the CUDA preprocess's fixed 3-sigma clip. False
    # reproduces the reference's 3-sigma tile-rect truncation (pairs with
    # the dense oracle's default tile_size).
    exact_radius: bool = True
    # backward gradient-regroup route: "sort" (invert the binning sort with
    # a second 1-D sort + row gather) or "scatter" (one unique-index
    # permutation scatter, no second sort). See binning.regroup_pair_grads.
    # Global layout only: combining 'scatter' with per-view regions (which
    # have their own segmented route) raises — set per_view_budget=False.
    regroup_mode: str = "sort"
    # pair-stream layout: None = auto (per-view regions when V > 1, global
    # otherwise). Per-view regions split the pair budget into V fixed
    # chunk-aligned regions so the backward regroup gathers from static
    # <= 32 MB table slices (the V >= 4 global-table gather crosses the TPU
    # gather cache cliff — the round-3 V=10 regression, PERF.md round 4);
    # global keeps one shared budget that absorbs per-view pair imbalance.
    per_view_budget: bool | None = None
    # compact valid candidates into the budget-sized buffer BEFORE the
    # binning sort (one linear cumsum + two unique 1-D scatters for a ~2x
    # shorter sort each way — ~73% of emitted slots are invalid at avatar
    # scale); when the budget clips, drops happen in emission (view-major)
    # order instead of sorted-key order — same count, different membership.
    compact_sort: bool = False
    # per-tile early termination once every pixel saturates (T < 1e-4).
    # The check costs a [1,PX] max-reduce + scalar branch sync per chunk
    # and cannot fire while any background pixel stays uncovered; False
    # runs a branch-free fori_loop over all chunks instead (identical
    # output — saturated chunks contribute exact zeros).
    early_stop: bool = True

    @property
    def ntx(self) -> int:
        return -(-self.img_w // self.tile)

    @property
    def nty(self) -> int:
        return -(-self.img_h // self.tile)

    @property
    def n_tiles(self) -> int:
        return self.ntx * self.nty


def _place_and_chunk(cfg, dims, feats16, feats_big, valid_prefix, pay_prefix):
    """[V*N,16] rows -> dense chunked pair stream [NC, 16, chunk].

    (The kernels would prefer row-major [chunk, 16] blocks — that would make
    this reshape free — but Mosaic requires HBM DMA slices to be 128-aligned
    in the last dim, so the stream must be transposed to feats-major here.)"""
    budget = dims[5]
    placed = binning_lib.place_pairs(feats16, feats_big, valid_prefix,
                                     pay_prefix, dims)
    return jnp.swapaxes(
        placed.reshape(budget // cfg.chunk, cfg.chunk,
                       binning_lib.PAIR_FEATS), 1, 2,
    )


# ONE custom-VJP boundary covering placement + tile compositing. Fusing the
# two (they used to be separate custom_vjps) lets the backward pass keep the
# pair-gradient stream in bf16 end to end — kernel store -> regroup gather —
# without ever violating a cotangent-dtype check at a custom_vjp seam: the
# only cotangent crossing this boundary is the small f32 d(feats16).
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _composite(cfg: RasterizeConfig, dims, feats16, feats_big, valid_prefix,
               pay_prefix, payload, total_valid, sel_flat, seg_bounds,
               tile_start_f, tile_count_f):
    pair_feats = _place_and_chunk(cfg, dims, feats16, feats_big, valid_prefix,
                                  pay_prefix)
    tiles = pallas_forward.forward_tiles(
        pair_feats,
        tile_start_f.astype(jnp.int32),
        tile_count_f.astype(jnp.int32),
        n_programs=tile_start_f.shape[0],
        ntx_per_view=cfg.ntx,
        tiles_per_view=cfg.n_tiles,
        chunk=cfg.chunk,
        interpret=cfg.interpret,
        cumsum_mode=cfg.cumsum_mode,
        tile=cfg.tile,
        early_stop=cfg.early_stop,
    )
    return tiles


def _composite_fwd(cfg, dims, feats16, feats_big, valid_prefix, pay_prefix,
                   payload, total_valid, sel_flat, seg_bounds, tile_start_f,
                   tile_count_f):
    pair_feats = _place_and_chunk(cfg, dims, feats16, feats_big, valid_prefix,
                                  pay_prefix)
    tiles = pallas_forward.forward_tiles(
        pair_feats,
        tile_start_f.astype(jnp.int32),
        tile_count_f.astype(jnp.int32),
        n_programs=tile_start_f.shape[0],
        ntx_per_view=cfg.ntx,
        tiles_per_view=cfg.n_tiles,
        chunk=cfg.chunk,
        interpret=cfg.interpret,
        cumsum_mode=cfg.cumsum_mode,
        tile=cfg.tile,
        early_stop=cfg.early_stop,
    )
    res = (pair_feats, payload, total_valid, sel_flat, seg_bounds,
           tile_start_f, tile_count_f, tiles)
    return tiles, res


def _composite_bwd(cfg, dims, res, g_tiles):
    (pair_feats, payload, total_valid, sel_flat, seg_bounds,
     tile_start_f, tile_count_f, tiles) = res
    budget = dims[5]
    d_pairs = pallas_backward.backward_tiles(
        pair_feats,
        tile_start_f.astype(jnp.int32),
        tile_count_f.astype(jnp.int32),
        tiles,
        g_tiles,
        ntx_per_view=cfg.ntx,
        tiles_per_view=cfg.n_tiles,
        chunk=cfg.chunk,
        interpret=cfg.interpret,
        out_bf16=cfg.grad_stream_bf16,
        cumsum_mode=cfg.cumsum_mode,
        tile=cfg.tile,
        early_stop=cfg.early_stop,
        view_regions=dims[6] > 0,
    )                                        # [NC, 16, chunk] f32 | bf16
    g_stream = jnp.swapaxes(d_pairs, 1, 2).reshape(
        budget, binning_lib.PAIR_FEATS
    )
    d_feats16 = binning_lib.regroup_pair_grads(
        g_stream, payload, total_valid, sel_flat, dims,
        mode=cfg.regroup_mode, seg_bounds=seg_bounds,
    )
    f0 = binning_lib._float0
    v, n, k_big = dims[0], dims[1], dims[2]
    return (
        d_feats16,
        # feats_big is feats16[rowsel] built OUTSIDE this boundary; its
        # gradient contribution is already folded into d_feats16 by
        # regroup_pair_grads' sel scatter-add, so its own cotangent is 0
        # (a nonzero one would double-count through the outer gather's VJP)
        jnp.zeros((v * k_big, binning_lib.PAIR_FEATS), d_feats16.dtype),
        f0(jnp.zeros((budget,), jnp.bool_)),   # valid_prefix
        f0(jnp.zeros((budget,), jnp.int32)),   # pay_prefix
        f0(payload),
        f0(total_valid),
        f0(sel_flat),
        f0(seg_bounds),
        jnp.zeros_like(tile_start_f),
        jnp.zeros_like(tile_count_f),
    )


_composite.defvjp(_composite_fwd, _composite_bwd)


def rasterize_single(
    means3d: jnp.ndarray,        # [N,3]
    cov3d: jnp.ndarray,          # [N,6] packed
    colors: jnp.ndarray,         # [N,3]
    opacity: jnp.ndarray,        # [N]
    cam_view: jnp.ndarray,       # [V,4,4]
    cam_view_proj: jnp.ndarray,  # [V,4,4]
    bg_color: jnp.ndarray,       # [3]
    cfg: RasterizeConfig,
):
    """Render one Gaussian set from V cameras. Returns dict of [V,...] maps."""
    # Mosaic needs tile*tile % 128 == 0 for the kernels' VMEM output blocks;
    # fail here with a clear message instead of an opaque lowering error
    assert cfg.tile in (16, 32), (
        f"RasterizeConfig.tile must be 16 or 32, got {cfg.tile}")
    V = cam_view.shape[0]
    proj = jax.vmap(
        lambda cv, cvp: project_gaussians(
            means3d, cov3d, cv, cvp,
            cfg.tan_half_fovx, cfg.tan_half_fovy, cfg.img_h, cfg.img_w,
        )
    )(cam_view, cam_view_proj)

    # one flat binning over all V views: one sort, one gather (binning v5 —
    # see binning.py module doc); per-view regions default on for V > 1
    # (keeps the backward regroup's gather tables under the cache cliff)
    pvb = cfg.per_view_budget if cfg.per_view_budget is not None else V > 1
    if pvb and cfg.regroup_mode != "sort":
        # Per-view regions use their own segmented regroup; a non-default
        # regroup_mode would be silently ignored — an A/B of
        # regroup_mode='scatter' at V>1 would measure the same route twice
        # (advisor r4). Force global layout to honor the request.
        raise ValueError(
            f"regroup_mode={cfg.regroup_mode!r} is only implemented for the "
            "global pair-stream layout; set per_view_budget=False to A/B it "
            "(per-view regions always regroup via the segmented sort route)")
    bins = binning_lib.bin_gaussians(
        proj, colors, opacity, cfg.img_h, cfg.img_w,
        tile_size=cfg.tile,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        chunk=cfg.chunk,
        pair_budget=cfg.pair_budget_factor * means3d.shape[0] * V,
        big_win=cfg.big_win,
        exact_radius=cfg.exact_radius,
        per_view_budget=pvb,
        compact=cfg.compact_sort,
    )

    tiles = _composite(
        cfg, bins.dims, bins.feats16, bins.feats_big, bins.valid_prefix,
        bins.pay_prefix,
        bins.payload, bins.total_valid, bins.sel_flat, bins.seg_bounds,
        bins.tile_start.astype(jnp.float32),
        bins.tile_count.astype(jnp.float32),
    )                                                   # [V*n_tiles, 8, PX]

    rgb, depth, alpha = _assemble(tiles, V, cfg)
    image = rgb + (1.0 - alpha) * bg_color[None, :, None, None]
    return {
        "image": jnp.clip(image, 0.0, 1.0),
        "alpha": alpha,
        "depth": depth,
        "overflow": bins.overflow,
    }


def _assemble(tiles: jnp.ndarray, V: int, cfg: RasterizeConfig):
    """[V*n_tiles, 8, PX] -> (rgb [V,3,H,W], depth [V,1,H,W], alpha [V,1,H,W])."""
    t = tiles.reshape(V, cfg.nty, cfg.ntx, 8, cfg.tile, cfg.tile)
    t = jnp.transpose(t, (0, 3, 1, 4, 2, 5))  # [V,8,nty,TILE,ntx,TILE]
    t = t.reshape(V, 8, cfg.nty * cfg.tile, cfg.ntx * cfg.tile)
    t = t[:, :, : cfg.img_h, : cfg.img_w]
    return t[:, 0:3], t[:, 3:4], t[:, 4:5]


def rasterize(
    means3d: jnp.ndarray,        # [B,N,3]
    cov3d: jnp.ndarray,          # [B,N,6]
    colors: jnp.ndarray,         # [B,N,3]
    opacity: jnp.ndarray,        # [B,N]
    cam_view: jnp.ndarray,       # [B,V,4,4]
    cam_view_proj: jnp.ndarray,  # [B,V,4,4]
    bg_color: jnp.ndarray,       # [3]
    cfg: RasterizeConfig,
):
    """Batched render. Returns image [B,V,3,H,W], alpha/depth [B,V,1,H,W]."""
    B, V = cam_view.shape[:2]
    outs = []
    for b in range(B):  # unrolled: keeps per-step pair memory bounded
        outs.append(
            rasterize_single(
                means3d[b], cov3d[b], colors[b], opacity[b],
                cam_view[b], cam_view_proj[b], bg_color, cfg,
            )
        )
    return {
        k: jnp.stack([o[k] for o in outs]) for k in outs[0]
    }
