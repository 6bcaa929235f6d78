"""Pallas TPU backward kernel: analytic VJP of the tile compositing pass.

Math: replaying front-to-back with the suffix trick. With
``u_k = dL/dw_k = g_rgb . c_k + g_depth * depth_k`` and
``TOT = sum_j u_j w_j = g_rgb . rgb_out + g_depth * depth_out`` (computable
per-pixel from the forward outputs alone),

    dL/dalpha_k = mask_k * [ u_k T_excl_k
                             - (TOT - prefix_{j<=k} u_j w_j - g_alpha * Tr)
                               / (1 - alpha_k) ]

which needs only a running prefix accumulator — no back-to-front pass, unlike
the CUDA implementation's reverse traversal.

Write side (binning v5): pair segments are NOT chunk-aligned, so a boundary
chunk holds the tail of one (view, tile) segment and the head of the next
(possibly across a view boundary — the stream is global). Gradients
are still written race-free WITHOUT re-laying out the pair stream by
exploiting that a Pallas TPU grid with "arbitrary" dimension semantics runs
its programs SEQUENTIALLY on one core: a VMEM carry buffer (scratch persists
across grid steps) holds each tile's partial tail chunk; the next tile merges
its head rows into the carry before the chunk is written exactly once. Each
program's masked rows are exact zeros, so the merge is a plain add.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sigman_release_tpu.ops.rasterizer.binning import (
    F_CA, F_CB, F_CC, F_DEPTH, F_MX, F_MY, F_OPA, F_R, PAIR_FEATS,
)
from sigman_release_tpu.ops.rasterizer.pallas_forward import (
    PX, _chunk_alpha, _cumsum0, _pixel_coords,
)

T_EPS = 1e-4

# SMEM state persisted across (sequential) grid programs
_S_CARRY_IDX = 0   # chunk index held in the carry buffer, -1 if none
_S_WCOUNT = 1      # total emitted writes (selects the write buffer slot)
_S_ISSUED0 = 2     # write slot 0 has an in-flight/unwaited DMA
_S_ISSUED1 = 3


def _backward_kernel(
    start_ref, count_ref,            # scalar-prefetch
    pairs_hbm,                       # [NC, 16, chunk] f32, ANY
    fwd_ref,                         # [1, 8, PX] forward tile buffer, VMEM
    grad_ref,                        # [1, 8, PX] upstream grads, VMEM
    zinit_hbm,                       # [NC, 16, chunk] zeros, aliased to out
    dpairs_hbm,                      # out: [NC, 16, chunk] f32, ANY
    chunk_vmem, out_vmem, carry_vmem, state, dma_sem, out_sem,
    *, ntx_per_view, tiles_per_view, chunk,
):
    t = pl.program_id(0)
    tile_in_view = t % tiles_per_view
    is_last = t == pl.num_programs(0) - 1
    start = start_ref[t]
    count = count_ref[t]
    chunk0 = start // chunk
    off = start % chunk
    end = start + count
    end_unaligned = end % chunk != 0
    px, py = _pixel_coords(tile_in_view, ntx_per_view)

    @pl.when(t == 0)
    def _():
        state[_S_CARRY_IDX] = -1
        state[_S_WCOUNT] = 0
        state[_S_ISSUED0] = 0
        state[_S_ISSUED1] = 0

    g_r = grad_ref[0, 0:1, :]
    g_g = grad_ref[0, 1:2, :]
    g_b = grad_ref[0, 2:3, :]
    g_d = grad_ref[0, 3:4, :]
    g_a = grad_ref[0, 4:5, :]
    rgb_r = fwd_ref[0, 0:1, :]
    rgb_g = fwd_ref[0, 1:2, :]
    rgb_b = fwd_ref[0, 2:3, :]
    dep_o = fwd_ref[0, 3:4, :]
    Tr = fwd_ref[0, 5:6, :]

    # per-pixel total weighted-grad sum + final-T path (g_alpha acts on 1 - Tr)
    tot = g_r * rgb_r + g_g * rgb_g + g_b * rgb_b + g_d * dep_o
    tail_const = g_a * Tr                                # enters with - sign
    g_rgb = jnp.concatenate([g_r, g_g, g_b], axis=0)     # [3,PX]

    n_chunks = pl.cdiv(off + count, chunk)
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def start_in_dma(c, slot):
        pltpu.make_async_copy(
            pairs_hbm.at[chunk0 + c], chunk_vmem.at[slot], dma_sem.at[slot]
        ).start()

    @pl.when(n_chunks > 0)
    def _():
        start_in_dma(0, 0)

    def emit(ci, data):
        """Write one [16,chunk] grad block to dpairs[ci] (double-buffered)."""
        w = state[_S_WCOUNT]
        slot = w % 2

        @pl.when(state[_S_ISSUED0 + slot] == 1)
        def _():
            pltpu.make_async_copy(
                out_vmem.at[slot], dpairs_hbm.at[0], out_sem.at[slot]
            ).wait()

        out_vmem[slot] = data
        pltpu.make_async_copy(
            out_vmem.at[slot], dpairs_hbm.at[ci], out_sem.at[slot]
        ).start()
        state[_S_ISSUED0 + slot] = 1
        state[_S_WCOUNT] = w + 1

    def place_chunk(c, dT):
        """Route one computed grad block: merge carry, hold tail, or emit."""
        ci = chunk0 + c
        carry_idx = state[_S_CARRY_IDX]
        is_merge = ci == carry_idx
        data = dT + jnp.where(is_merge, carry_vmem[0], 0.0)
        hold = (c == n_chunks - 1) & end_unaligned & jnp.logical_not(is_last)

        @pl.when(hold)
        def _():
            carry_vmem[0] = data
            state[_S_CARRY_IDX] = ci

        @pl.when(jnp.logical_not(hold))
        def _():
            emit(ci, data)

            @pl.when(is_merge)
            def _():
                state[_S_CARRY_IDX] = -1

    def body(st):
        c, Tf, prefix = st
        slot = c % 2
        pltpu.make_async_copy(
            pairs_hbm.at[chunk0 + c], chunk_vmem.at[slot], dma_sem.at[slot]
        ).wait()

        @pl.when(c + 1 < n_chunks)
        def _():
            start_in_dma(c + 1, (c + 1) % 2)

        feats = chunk_vmem[slot, :, :].T                  # [K,16]
        p = c * chunk + row - off
        row_ok = (p >= 0) & (p < count)
        alpha, gexp, dx, dy, unclamped = _chunk_alpha(feats, px, py, row_ok)

        one_m = 1.0 - alpha
        lg = jnp.log(one_m)
        cum_incl = _cumsum0(lg)
        t_incl = Tf * jnp.exp(cum_incl)
        t_excl = t_incl / one_m                      # one_m >= 0.01: safe
        contrib = t_incl >= T_EPS
        w = jnp.where(contrib, alpha * t_excl, 0.0)      # [K,PX]

        cols = feats[:, F_R:F_R + 3]
        u = jax.lax.dot_general(                          # [K,PX]
            cols, g_rgb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + feats[:, F_DEPTH:F_DEPTH + 1] * g_d
        uw = u * w
        pref_incl = prefix + _cumsum0(uw)                 # [K,PX]
        suffix = tot - pref_incl                          # sum over j > k
        d_alpha = jnp.where(
            contrib,
            u * t_excl - (suffix - tail_const) / one_m,
            0.0,
        )

        # chain to pair parameters; clamp & floor rules gate the gradient.
        # masked rows (outside [off, off+count)) have live=False -> all
        # outputs exactly zero, which the carry merge relies on.
        live = (alpha > 0.0) & unclamped
        d_pow = jnp.where(live, d_alpha * alpha, 0.0)     # dalpha/dpower = alpha
        d_opa_px = jnp.where(live, d_alpha * gexp, 0.0)

        ca = feats[:, F_CA:F_CA + 1]
        cb = feats[:, F_CB:F_CB + 1]
        cc = feats[:, F_CC:F_CC + 1]
        d_mx = jnp.sum(d_pow * (-(ca * dx + cb * dy)), axis=1, keepdims=True)
        d_my = jnp.sum(d_pow * (-(cc * dy + cb * dx)), axis=1, keepdims=True)
        d_ca = jnp.sum(d_pow * (-0.5 * dx * dx), axis=1, keepdims=True)
        d_cb = jnp.sum(d_pow * (-dx * dy), axis=1, keepdims=True)
        d_cc = jnp.sum(d_pow * (-0.5 * dy * dy), axis=1, keepdims=True)
        d_opa = jnp.sum(d_opa_px, axis=1, keepdims=True)
        d_col = jax.lax.dot_general(                      # [K,3]
            w, g_rgb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_dep = jnp.sum(w * g_d, axis=1, keepdims=True)

        zeros = jnp.zeros_like(d_mx)
        dgrads = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_col, d_opa, d_dep,
             zeros, zeros, zeros, zeros, zeros, zeros],
            axis=-1,
        )                                                 # [K,16]
        place_chunk(c, dgrads.T)
        return (c + 1, t_incl[-1:, :], pref_incl[-1:, :])

    def cond(st):
        c, Tf, _ = st
        return (c < n_chunks) & (jnp.max(Tf) >= T_EPS)

    init = (jnp.int32(0), jnp.ones((1, PX), jnp.float32),
            jnp.zeros((1, PX), jnp.float32))
    c_end, _, _ = jax.lax.while_loop(cond, body, init)

    # drain a prefetched input of an early-terminated loop; skipped chunks
    # need no zero-fill — the output buffer is zero-initialized via
    # input_output_aliases, and saturated pairs have exactly zero gradient
    @pl.when(c_end < n_chunks)
    def _():
        pltpu.make_async_copy(
            pairs_hbm.at[chunk0 + c_end], chunk_vmem.at[c_end % 2],
            dma_sem.at[c_end % 2],
        ).wait()

    # the grid's final program flushes any carry left by preceding tiles
    @pl.when(is_last & (state[_S_CARRY_IDX] >= 0))
    def _():
        emit(state[_S_CARRY_IDX], carry_vmem[0])
        state[_S_CARRY_IDX] = -1

    # the grid's final program must not leave DMAs in flight
    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        for slot in (0, 1):
            @pl.when(state[_S_ISSUED0 + slot] == 1)
            def _():
                pltpu.make_async_copy(
                    out_vmem.at[slot], dpairs_hbm.at[0], out_sem.at[slot]
                ).wait()


@functools.partial(
    jax.jit,
    static_argnames=("ntx_per_view", "tiles_per_view", "chunk", "interpret"),
)
def backward_tiles(
    pair_feats: jnp.ndarray,    # [NC, 16, chunk]
    tile_start: jnp.ndarray,    # [n_programs]
    tile_count: jnp.ndarray,
    fwd_tiles: jnp.ndarray,     # [n_programs, 8, PX] forward outputs
    grad_tiles: jnp.ndarray,    # [n_programs, 8, PX] upstream grads
    *,
    ntx_per_view: int,
    tiles_per_view: int,
    chunk: int = 128,
    interpret: bool = False,
):
    """Returns d(pair_feats) [NC, 16, chunk]."""
    n_programs = fwd_tiles.shape[0]
    kernel = functools.partial(
        _backward_kernel,
        ntx_per_view=ntx_per_view,
        tiles_per_view=tiles_per_view,
        chunk=chunk,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_programs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 8, PX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, PX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, PAIR_FEATS, chunk), jnp.float32),
            pltpu.VMEM((2, PAIR_FEATS, chunk), jnp.float32),
            pltpu.VMEM((1, PAIR_FEATS, chunk), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # the output is zero-INITIALIZED by aliasing a zeros input (an XLA
    # memset, ~free): chunks beyond the valid stream or skipped by early
    # termination then hold exact zeros, which the binning VJP relies on
    # (no validity mask on its regroup gather). Index 5 = the zeros operand
    # counting the two scalar-prefetch args.
    zinit = jnp.zeros(pair_feats.shape, jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(pair_feats.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the carry scheme REQUIRES sequential grid execution
            dimension_semantics=("arbitrary",),
        ),
    )(tile_start, tile_count, pair_feats, fwd_tiles, grad_tiles, zinit)
