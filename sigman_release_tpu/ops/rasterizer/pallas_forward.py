"""Pallas TPU forward kernel: per-tile front-to-back alpha compositing.

TPU-native re-design of ``renderCUDA`` (the per-pixel warp loop of the CUDA
``diff_gaussian_rasterization``): one grid program per 32x32-pixel tile,
Gaussian pairs streamed from HBM in depth order in chunks of ``K``. Inside a
chunk the sequential transmittance recurrence is *vectorised*:

    T_incl = exp(cumsum(log(1 - alpha)))         (prefix scan over the chunk)
    w_k    = alpha_k * T_in * T_excl_k * mask_k  (mask = early-stop rule)
    rgb   += colors^T @ w                         (an MXU matmul!)

so splat compositing becomes cumsum + matmul instead of a scalar loop —
that is the trick that makes this kernel map to the VPU/MXU instead of
emulating CUDA warps. Compositing rules (0.99 alpha clamp, 1/255 floor,
T < 1e-4 stop) match the dense golden model in reference.py exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sigman_release_tpu.ops.rasterizer.binning import (
    ALPHA_MIN, F_CA, F_CB, F_CC, F_DEPTH, F_MX, F_MY, F_OPA, F_R, PAIR_FEATS,
)

ALPHA_MAX = 0.99
T_EPS = 1e-4
# positive-power tolerance of the expanded-basis exponent matmul (see
# _chunk_alpha): ~100x its measured f32 rounding scale, orders below any
# real conic-PSD violation
POWER_EPS = 1e-3

TILE = 32              # default logical pixel tile (32 x 32 = 1024 px)
PX = TILE * TILE       # kernels take `tile` as a static arg; these are defaults


def _cumsum0(x: jnp.ndarray, mode: str = "f32",
             exclusive: bool = False) -> jnp.ndarray:
    """Prefix sum along axis 0 as a triangular matmul.

    [K,P] -> [K,P]. Guaranteed Mosaic lowering and runs on the MXU — the
    per-chunk transmittance scan costs one (K,K)@(K,P) matmul. This matmul
    is ~2/3 of each kernel's per-chunk FLOPs and Mosaic runs f32 dots as
    multi-pass bf16 on the MXU, so ``mode`` trades passes for precision:

    * ``"f32"``    — full f32 operands (slowest, exactly matches the oracle);
    * ``"bf16x2"`` — tri (exactly 0/1) in bf16 and x split hi+lo into two
      bf16 passes with f32 accumulation: ~2^-16 relative rounding per
      element, one fewer MXU pass than f32;
    * ``"bf16"``   — single bf16 pass (~2^-9 relative rounding of x).

    ``exclusive`` uses the strictly-lower triangle (row k sums rows < k):
    the exclusive transmittance then comes straight off the MXU, replacing
    the kernels' [K,PX] VPU divide by (1-alpha) with a multiply.

    ``"scan"`` skips the MXU entirely: a Hillis-Steele scan over the
    sublane axis — log2(K) shifted [K,P] adds on the VPU (~14 elem-ops per
    element) versus the tri matmul's K MACs per element (128 at chunk=128).
    Same f32 precision class as the matmul (different association order);
    A/B'd on-chip by benchmarks/cumsum_mode_bench.py.
    """
    k = x.shape[0]
    if mode == "scan":
        if exclusive:                    # shift the stream down one row
            x = jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
        s = x
        d = 1
        while d < k:
            shifted = jnp.concatenate(
                [jnp.zeros_like(s[:d]), s[:-d]], axis=0)
            s = s + shifted
            d *= 2
        return s
    ri = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    cmp = (ci < ri) if exclusive else (ci <= ri)
    if mode == "f32":
        tri = cmp.astype(x.dtype)
        return jax.lax.dot_general(
            tri, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    tri = cmp.astype(jnp.bfloat16)
    hi = x.astype(jnp.bfloat16)
    cum = jax.lax.dot_general(
        tri, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if mode == "bf16":
        return cum
    assert mode == "bf16x2", mode
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return cum + jax.lax.dot_general(
        tri, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _trans_excl(one_m: jnp.ndarray, Tf: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Exclusive transmittance prefix Tf * prod_{j<k}(1 - alpha_j), [K,PX].

    Default route: log -> exclusive tri-matmul cumsum -> exp (the prefix sum
    rides the MXU). ``mode="mulscan"`` instead runs a MULTIPLICATIVE
    Hillis-Steele scan over the sublane axis — log2(K) shifted [K,PX]
    multiplies — deleting BOTH transcendentals (log+exp) AND the tri matmul.
    The additive VPU scan lost on-chip (Mosaic materializes the shifted adds
    as relayout copies — PERF.md round-3b), but it kept log+exp; this one
    removes them too, so it is a separate A/B. Precision: f32 product of
    <=K factors in (0.01, 1], ~K*2^-24 relative — same class as the f32
    matmul path (different association order).
    """
    if mode != "mulscan":
        lg = jnp.log(one_m)                          # alpha <= 0.99 -> finite
        return Tf * jnp.exp(_cumsum0(lg, mode, exclusive=True))
    k = one_m.shape[0]
    s = jnp.concatenate([jnp.ones_like(one_m[:1]), one_m[:-1]], axis=0)
    d = 1
    while d < k:
        shifted = jnp.concatenate([jnp.ones_like(s[:d]), s[:-d]], axis=0)
        s = s * shifted
        d *= 2
    return Tf * s


def _pixel_coords(tile_idx, ntx, tile):
    """Pixel-center coordinates of this tile as (1, tile*tile) f32 arrays."""
    tile_x = (tile_idx % ntx).astype(jnp.float32)
    tile_y = (tile_idx // ntx).astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (1, tile * tile), 1)
    px = tile_x * tile + (p % tile).astype(jnp.float32)
    py = tile_y * tile + (p // tile).astype(jnp.float32)
    return px, py


def _pixel_basis(px, py):
    """Tile origin + the [PX, 8] pixel-moment basis [1, X, Y, X^2, XY, Y^2]
    in TILE-LOCAL coordinates (X = px - origin) — shared by the quadratic
    power evaluation (below) and the backward kernel's moment reductions."""
    ox = px[:, 0:1]                                # first pixel = tile origin
    oy = py[:, 0:1]
    xl = px - ox
    yl = py - oy
    basis = jnp.concatenate(
        [jnp.ones_like(xl), xl, yl, xl * xl, xl * yl, yl * yl,
         jnp.zeros_like(xl), jnp.zeros_like(xl)], axis=0,
    ).T                                            # [PX, 8]
    return ox, oy, basis


def _chunk_alpha(feats, ox, oy, basis, row_ok):
    """Per-chunk alpha evaluation shared by forward and backward.

    feats [K,16] f32; (ox, oy, basis) from :func:`_pixel_basis`;
    row_ok (K,1) bool. The Gaussian exponent is a per-pair QUADRATIC in
    pixel coords, so its pixel grid evaluates as ONE [K,8]@[PX,8]^T MXU
    matmul of per-pair coefficients against the constant moment basis —
    replacing ~9 [K,PX] VPU ops (dx/dy/products) per chunk. Tile-local
    coords keep |coeff·moment| ~ the exponent's own magnitude, far from
    f32 cancellation.
    """
    ml = feats[:, F_MX:F_MX + 1] - ox              # [K,1] tile-local mean
    nl = feats[:, F_MY:F_MY + 1] - oy
    ca = feats[:, F_CA:F_CA + 1]
    cb = feats[:, F_CB:F_CB + 1]
    cc = feats[:, F_CC:F_CC + 1]
    opa = feats[:, F_OPA:F_OPA + 1]
    # -0.5 ca (ml-X)^2 - 0.5 cc (nl-Y)^2 - cb (ml-X)(nl-Y)  expanded in X, Y
    c0 = -0.5 * (ca * ml * ml + cc * nl * nl) - cb * ml * nl
    cx = ca * ml + cb * nl
    cy = cc * nl + cb * ml
    zero = jnp.zeros_like(c0)
    coeffs = jnp.concatenate(
        [c0, cx, cy, -0.5 * ca, -cb, -0.5 * cc, zero, zero], axis=-1
    )                                              # [K,8]
    power = jax.lax.dot_general(                   # [K,PX]
        coeffs, basis, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # f32 cancellation in the expanded-basis matmul can leave power at +eps
    # exactly where the true quadratic is ~0: a pixel ON the mean, where
    # alpha is LARGEST. The CUDA-style guard `power > 0 -> skip` is only
    # safe for direct d = pixel - mean evaluation (q >= 0 by construction);
    # here it dropped a 0.74-alpha gaussian at its own mean pixel (round-4
    # verify drive). Clamp the exponent instead (alpha <= opa stays
    # bounded; the error vs the true tiny-negative power is <= POWER_EPS)
    # and keep the hard drop only for grossly positive power (broken
    # conics), far above the matmul's rounding scale. Straight-through note
    # (advisor r4): in the clamp band 0 < power <= POWER_EPS the forward
    # alpha is the constant opa (exp clamped at 0) while the backward still
    # differentiates alpha = opa*exp(power) — a deliberate straight-through
    # derivative, mismatch bounded by ~POWER_EPS (1e-3) relative.
    g = jnp.exp(jnp.minimum(power, 0.0))
    raw = opa * g
    live = row_ok & (power <= POWER_EPS)
    alpha = jnp.where(live & (raw >= ALPHA_MIN), jnp.minimum(raw, ALPHA_MAX), 0.0)
    unclamped = raw < ALPHA_MAX                    # gradient mask for the clamp
    return alpha, unclamped


def _forward_kernel(
    start_ref, count_ref,           # scalar-prefetch [n_tiles_total]
    pairs_hbm,                      # [NC, 16, chunk] f32 in ANY/HBM
    out_ref,                        # [T, 8, PX] f32 per-program output block
    chunk_vmem, dma_sem,            # scratch
    *, ntx_per_view, tiles_per_view, chunk, tiles_per_program, cumsum_mode,
    tile, early_stop,
):
    # T tiles per grid program: the fixed per-program cost (prologue, block
    # copies, scalar bookkeeping) measured ~4.5us — at one tile per program
    # it DOMINATED the kernel (2560 near-empty programs = ~11.5 ms). The
    # fori_loop amortizes it across T consecutive tiles.
    tp = pl.program_id(0)

    def tile_body(tt, _):
        t = tp * tiles_per_program + tt
        _forward_one_tile(t, tt, start_ref, count_ref, pairs_hbm, out_ref,
                          chunk_vmem, dma_sem, ntx_per_view, tiles_per_view,
                          chunk, cumsum_mode, tile, early_stop)
        return 0

    jax.lax.fori_loop(0, tiles_per_program, tile_body, 0)


def _forward_one_tile(
    t, tt, start_ref, count_ref, pairs_hbm, out_ref, chunk_vmem, dma_sem,
    ntx_per_view, tiles_per_view, chunk, cumsum_mode, tile, early_stop,
):
    tile_in_view = t % tiles_per_view
    start = start_ref[t]
    count = count_ref[t]
    # segments are NOT chunk-aligned (binning v4): the first/last chunk is
    # shared with neighbouring tiles; rows outside [off, off+count) mask off
    # (px/py computed below; ox/oy/basis feed the quadratic power matmul)
    chunk0 = start // chunk
    off = start % chunk
    px, py = _pixel_coords(tile_in_view, ntx_per_view, tile)
    ox, oy, basis = _pixel_basis(px, py)

    n_chunks = pl.cdiv(off + count, chunk)
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def start_dma(c, slot):
        pltpu.make_async_copy(
            pairs_hbm.at[chunk0 + c], chunk_vmem.at[slot], dma_sem.at[slot]
        ).start()

    @pl.when(n_chunks > 0)
    def _():
        start_dma(0, 0)

    # Two transmittance carries (see reference.py for the shared rules):
    #   Tf — product of (1-alpha) over ALL processed gaussians; monotone, used
    #        for the early-stop mask (a pixel is permanently done once
    #        Tf < T_EPS) and for exclusive weights (identical to the
    #        contributors-only product while the mask holds),
    #   Tr — product over *contributors* only; frozen at the stop point; this
    #        is the T the CUDA renderer uses for background blending.
    def body(state):
        c, Tf, Tr, r, g, b, d = state
        slot = c % 2
        # wait for this chunk, immediately prefetch the next (double buffer)
        pltpu.make_async_copy(
            pairs_hbm.at[chunk0 + c], chunk_vmem.at[slot], dma_sem.at[slot]
        ).wait()

        @pl.when(c + 1 < n_chunks)
        def _():
            start_dma(c + 1, (c + 1) % 2)

        feats = chunk_vmem[slot, :, :].T             # [K,16]
        p = c * chunk + row - off                    # pair index within tile
        row_ok = (p >= 0) & (p < count)
        alpha, _ = _chunk_alpha(feats, ox, oy, basis, row_ok)

        one_m = 1.0 - alpha
        t_excl = _trans_excl(one_m, Tf, cumsum_mode)           # [K,PX]
        t_incl = t_excl * one_m                      # no [K,PX] divide
        contrib = t_incl >= T_EPS
        w = jnp.where(contrib, alpha * t_excl, 0.0)  # [K,PX]

        # one MXU matmul accumulates rgb AND depth (rows r,g,b,opa,depth —
        # the unused opa row is free: the contraction is over K either way)
        cols = feats[:, F_R:F_DEPTH + 1]             # [K,5]
        acc = jax.lax.dot_general(
            cols, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # [5,PX]
        Tf_new = t_incl[-1:, :]
        Tr_new = jnp.min(jnp.where(contrib, t_incl, Tr), axis=0, keepdims=True)
        return (c + 1, Tf_new, Tr_new,
                r + acc[0:1], g + acc[1:2], b + acc[2:3], d + acc[4:5])

    zero = jnp.zeros((1, tile * tile), jnp.float32)
    ones = jnp.ones((1, tile * tile), jnp.float32)
    init = (jnp.int32(0), ones, ones, zero, zero, zero, zero)
    if early_stop:
        def cond(state):
            c, Tf, *_ = state
            return (c < n_chunks) & (jnp.max(Tf) >= T_EPS)

        c_end, Tf, Tr, r, g, b, d = jax.lax.while_loop(cond, body, init)

        # early termination leaves one prefetched DMA in flight — drain it
        @pl.when(c_end < n_chunks)
        def _():
            pltpu.make_async_copy(
                pairs_hbm.at[chunk0 + c_end], chunk_vmem.at[c_end % 2],
                dma_sem.at[c_end % 2],
            ).wait()
    else:
        # branch-free variant: every chunk is processed (saturated chunks
        # contribute exactly zero via the contrib mask). The early-stop
        # cond costs a [1,PX] max-reduce + scalar branch sync per chunk
        # and almost never fires on real scenes (background pixels keep
        # Tf = 1 forever), so skipping it can win — A/B'd on-chip.
        def fbody(_, state):
            return body(state)

        _, Tf, Tr, r, g, b, d = jax.lax.fori_loop(0, n_chunks, fbody, init)

    out_ref[tt, 0, :] = r[0]
    out_ref[tt, 1, :] = g[0]
    out_ref[tt, 2, :] = b[0]
    out_ref[tt, 3, :] = d[0]
    out_ref[tt, 4, :] = 1.0 - Tr[0]
    out_ref[tt, 5, :] = Tr[0]
    out_ref[tt, 6, :] = zero[0]
    out_ref[tt, 7, :] = zero[0]


@functools.partial(
    jax.jit,
    static_argnames=("n_programs", "ntx_per_view", "tiles_per_view", "chunk",
                     "interpret", "cumsum_mode", "tile", "early_stop"),
)
def forward_tiles(
    pair_feats: jnp.ndarray,   # [P_pad, 16] f32
    tile_start: jnp.ndarray,   # [n_programs] int32
    tile_count: jnp.ndarray,   # [n_programs] int32
    *,
    n_programs: int,
    ntx_per_view: int,
    tiles_per_view: int,
    chunk: int = 128,
    interpret: bool = False,
    cumsum_mode: str = "f32",
    tile: int = TILE,
    early_stop: bool = True,
):
    """Run the tile kernel. Returns [n_programs, 8, tile*tile] raw buffers.

    Rows: 0-2 rgb (no background), 3 depth, 4 accumulated alpha, 5 final T.
    """
    px_n = tile * tile
    tpp = tiles_per_program(n_programs, cap=prog_cap(tile))
    kernel = functools.partial(
        _forward_kernel,
        ntx_per_view=ntx_per_view,
        tiles_per_view=tiles_per_view,
        chunk=chunk,
        tiles_per_program=tpp,
        cumsum_mode=cumsum_mode,
        tile=tile,
        early_stop=early_stop,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_programs // tpp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (tpp, 8, px_n), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PAIR_FEATS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_programs, 8, px_n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_start, tile_count, pair_feats)


def prog_cap(tile: int) -> int:
    """Tiles-per-program cap: hold ~8192 pixels per grid program so the
    fixed per-program cost stays amortized as the tile size shrinks."""
    return max(8, 8192 // (tile * tile))


def tiles_per_program(n_tiles_total: int, cap: int = 8) -> int:
    """Largest power of two <= cap dividing the total tile-program count."""
    t = 1
    while t < cap and n_tiles_total % (t * 2) == 0:
        t *= 2
    return t
