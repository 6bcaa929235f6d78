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
    PX, TILE, _chunk_alpha, _cumsum0, _pixel_basis, _pixel_coords,
    _trans_excl, prog_cap, tiles_per_program,
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
    fwd_ref,                         # [T, 8, PX] forward tile buffers, VMEM
    grad_ref,                        # [T, 8, PX] upstream grads, VMEM
    zinit_hbm,                       # [NC, 16, chunk] zeros, aliased to out
    dpairs_hbm,                      # out: [NC, 16, chunk] f32|bf16, ANY
    chunk_vmem, out_vmem, carry_vmem, state, dma_sem, out_sem,
    *, ntx_per_view, tiles_per_view, chunk, out_dtype, tiles_per_program,
    cumsum_mode, tile, early_stop, view_regions,
):
    # T tiles per grid program — amortizes the ~4.5us fixed per-program cost
    # (see _forward_kernel); the SMEM carry/emit state machine is already
    # cross-tile, so it runs unchanged inside the fori_loop.
    tp = pl.program_id(0)

    def tile_body(tt, _):
        t = tp * tiles_per_program + tt
        _backward_one_tile(t, tt, start_ref, count_ref, pairs_hbm, fwd_ref,
                           grad_ref, dpairs_hbm, chunk_vmem, out_vmem,
                           carry_vmem, state, dma_sem, out_sem,
                           ntx_per_view, tiles_per_view, chunk, out_dtype,
                           tiles_per_program, cumsum_mode, tile,
                           early_stop, view_regions)
        return 0

    jax.lax.fori_loop(0, tiles_per_program, tile_body, 0)


def _backward_one_tile(
    t, tt, start_ref, count_ref, pairs_hbm, fwd_ref, grad_ref, dpairs_hbm,
    chunk_vmem, out_vmem, carry_vmem, state, dma_sem, out_sem,
    ntx_per_view, tiles_per_view, chunk, out_dtype, tiles_per_program,
    cumsum_mode, tile, early_stop, view_regions,
):
    tile_in_view = t % tiles_per_view
    is_last = t == pl.num_programs(0) * tiles_per_program - 1
    if view_regions:
        # per-view placement regions (binning per_view_budget): regions are
        # chunk-aligned, so no tile of view v+1 ever touches view v's
        # chunks — a view's LAST tile must emit its unaligned tail instead
        # of holding it for a merge that would never come. (Only the hold
        # rule changes: the final-program carry flush / DMA drain below
        # must keep firing exactly once, at the true last program.)
        no_hold = is_last | (tile_in_view == tiles_per_view - 1)
    else:
        no_hold = is_last
    start = start_ref[t]
    count = count_ref[t]
    chunk0 = start // chunk
    off = start % chunk
    end = start + count
    end_unaligned = end % chunk != 0
    px, py = _pixel_coords(tile_in_view, ntx_per_view, tile)
    # tile-local moment basis (see _pixel_basis): shared by the quadratic
    # power matmul in _chunk_alpha and the d(mean)/d(conic) reductions —
    # five lane reductions become ONE [K,PX]@[PX,8] MXU matmul; tile-local
    # coords keep the m^2*S0 - 2m*SX + SXX expansions off f32 cancellation
    ox, oy, moments = _pixel_basis(px, py)

    @pl.when(t == 0)
    def _():
        state[_S_CARRY_IDX] = -1
        state[_S_WCOUNT] = 0
        state[_S_ISSUED0] = 0
        state[_S_ISSUED1] = 0

    g_r = grad_ref[tt, 0:1, :]
    g_g = grad_ref[tt, 1:2, :]
    g_b = grad_ref[tt, 2:3, :]
    g_d = grad_ref[tt, 3:4, :]
    g_a = grad_ref[tt, 4:5, :]
    rgb_r = fwd_ref[tt, 0:1, :]
    rgb_g = fwd_ref[tt, 1:2, :]
    rgb_b = fwd_ref[tt, 2:3, :]
    dep_o = fwd_ref[tt, 3:4, :]
    Tr = fwd_ref[tt, 5:6, :]

    # per-pixel total weighted-grad sum + final-T path (g_alpha acts on
    # 1 - Tr); the tail constant is folded in here ONCE instead of being
    # re-subtracted inside every chunk iteration
    tot2 = (g_r * rgb_r + g_g * rgb_g + g_b * rgb_b + g_d * dep_o
            - g_a * Tr)
    # [5,PX] grad rows matching the feats columns r,g,b,opa,depth — the zero
    # opa row makes u computable with the SAME [K,5] slice as the forward's
    # accumulation matmul (depth folded into the MXU op, not a VPU mul+add)
    g_rgb0d = jnp.concatenate(
        [g_r, g_g, g_b, jnp.zeros_like(g_r), g_d], axis=0)     # [5,PX]
    g_rgbd = jnp.concatenate([g_r, g_g, g_b, g_d], axis=0).T   # [PX,4]

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

        out_vmem[slot] = data.astype(out_dtype)
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
        hold = (c == n_chunks - 1) & end_unaligned & jnp.logical_not(no_hold)

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
        alpha, unclamped = _chunk_alpha(feats, ox, oy, moments, row_ok)

        one_m = 1.0 - alpha
        t_excl = _trans_excl(one_m, Tf, cumsum_mode)
        t_incl = t_excl * one_m
        inv_one_m = 1.0 / one_m                      # one_m >= 0.01: safe
        contrib = t_incl >= T_EPS
        w = jnp.where(contrib, alpha * t_excl, 0.0)      # [K,PX]

        u = jax.lax.dot_general(                          # [K,PX]
            feats[:, F_R:F_DEPTH + 1], g_rgb0d,           # [K,5]@[5,PX]
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        uw = u * w
        # the uw prefix is ADDITIVE — no multiplicative form exists, so
        # mulscan keeps the f32 tri matmul here (the additive VPU scan
        # measured slower — PERF.md round-3b)
        add_mode = "f32" if cumsum_mode == "mulscan" else cumsum_mode
        pref_incl = prefix + _cumsum0(uw, add_mode)       # [K,PX]
        # d_pow = d_alpha * alpha with d_alpha = u T_excl - (TOT - prefix)
        # / (1-alpha): multiplying through by alpha reuses uw (= alpha u
        # T_excl under the contrib mask, exactly 0 elsewhere) so the u
        # T_excl product is never formed separately. Masked rows (outside
        # [off, off+count)) have alpha == 0 -> exact zeros, which the carry
        # merge relies on; only the 0.99-clamp needs an explicit gate.
        ainv = alpha * inv_one_m
        d_pow = jnp.where(
            unclamped,
            uw - jnp.where(contrib, ainv * (tot2 - pref_incl), 0.0),
            0.0,
        )

        # ONE moment matmul replaces five [K,PX] lane reductions:
        # every d(mean)/d(conic) sum is a polynomial in tile-local pixel
        # coords weighted by d_pow, so [K,PX]@[PX,8] yields the raw moments
        # S0, SX, SY, SXX, SXY, SYY and the rest is [K,1] algebra.
        mom = jax.lax.dot_general(                         # [K,8]
            d_pow, moments, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s0 = mom[:, 0:1]
        sx = mom[:, 1:2]
        sy = mom[:, 2:3]
        sxx = mom[:, 3:4]
        sxy = mom[:, 4:5]
        syy = mom[:, 5:6]
        ml = feats[:, F_MX:F_MX + 1] - ox                  # tile-local mean
        nl = feats[:, F_MY:F_MY + 1] - oy
        dxs = ml * s0 - sx                                 # sum d_pow * dx
        dys = nl * s0 - sy
        ca = feats[:, F_CA:F_CA + 1]
        cb = feats[:, F_CB:F_CB + 1]
        cc = feats[:, F_CC:F_CC + 1]
        opa = feats[:, F_OPA:F_OPA + 1]
        d_mx = -(ca * dxs + cb * dys)
        d_my = -(cc * dys + cb * dxs)
        d_ca = -0.5 * (ml * ml * s0 - 2.0 * ml * sx + sxx)
        d_cb = -(ml * nl * s0 - ml * sy - nl * sx + sxy)
        d_cc = -0.5 * (nl * nl * s0 - 2.0 * nl * sy + syy)
        # live implies alpha = opa * gexp (unclamped), so
        # sum d_alpha * gexp = sum d_pow / opa
        d_opa = jnp.where(opa > 0.0, s0 / jnp.maximum(opa, 1e-12), 0.0)
        cd = jax.lax.dot_general(                          # [K,4] col+dep
            w, g_rgbd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        zeros = jnp.zeros_like(d_mx)
        dgrads = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, cd[:, 0:3], d_opa, cd[:, 3:4],
             zeros, zeros, zeros, zeros, zeros, zeros],
            axis=-1,
        )                                                 # [K,16]
        place_chunk(c, dgrads.T)
        return (c + 1, t_incl[-1:, :], pref_incl[-1:, :])

    init = (jnp.int32(0), jnp.ones((1, tile * tile), jnp.float32),
            jnp.zeros((1, tile * tile), jnp.float32))
    if early_stop:
        def cond(st):
            c, Tf, _ = st
            return (c < n_chunks) & (jnp.max(Tf) >= T_EPS)

        c_end, _, _ = jax.lax.while_loop(cond, body, init)

        # drain a prefetched input of an early-terminated loop; skipped
        # chunks need no zero-fill — the output buffer is zero-initialized
        # via input_output_aliases, and saturated pairs have exactly zero
        # gradient
        @pl.when(c_end < n_chunks)
        def _():
            pltpu.make_async_copy(
                pairs_hbm.at[chunk0 + c_end], chunk_vmem.at[c_end % 2],
                dma_sem.at[c_end % 2],
            ).wait()
    else:
        # branch-free: saturated chunks emit exact-zero gradient blocks
        # (see pallas_forward for the early-stop cost rationale). NOTE the
        # carry/emit state machine requires every chunk to be visited, so
        # this variant also keeps the write stream dense.
        jax.lax.fori_loop(0, n_chunks, lambda _, st: body(st), init)

    # the grid's final program flushes any carry left by preceding tiles
    @pl.when(is_last & (state[_S_CARRY_IDX] >= 0))
    def _():
        emit(state[_S_CARRY_IDX], carry_vmem[0])
        state[_S_CARRY_IDX] = -1

    # the grid's final program must not leave DMAs in flight
    @pl.when(is_last)
    def _():
        for slot in (0, 1):
            @pl.when(state[_S_ISSUED0 + slot] == 1)
            def _():
                pltpu.make_async_copy(
                    out_vmem.at[slot], dpairs_hbm.at[0], out_sem.at[slot]
                ).wait()


@functools.partial(
    jax.jit,
    static_argnames=("ntx_per_view", "tiles_per_view", "chunk", "interpret",
                     "out_bf16", "cumsum_mode", "tile", "early_stop",
                     "view_regions"),
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
    out_bf16: bool = False,
    cumsum_mode: str = "f32",
    tile: int = TILE,
    early_stop: bool = True,
    view_regions: bool = False,
):
    """Returns d(pair_feats) [NC, 16, chunk] (f32, or bf16 with ``out_bf16``).

    bf16 output halves the stream's HBM write traffic and — the real win —
    lets the regroup gather read a bf16 table (~4x faster gather path);
    per-pair gradients round to bf16, downstream sums stay f32.
    """
    out_dtype = jnp.bfloat16 if out_bf16 else jnp.float32
    px_n = tile * tile
    n_programs = fwd_tiles.shape[0]
    tpp = tiles_per_program(n_programs, cap=prog_cap(tile))
    kernel = functools.partial(
        _backward_kernel,
        ntx_per_view=ntx_per_view,
        tiles_per_view=tiles_per_view,
        chunk=chunk,
        out_dtype=out_dtype,
        tiles_per_program=tpp,
        cumsum_mode=cumsum_mode,
        tile=tile,
        early_stop=early_stop,
        view_regions=view_regions,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_programs // tpp,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((tpp, 8, px_n), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpp, 8, px_n), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, PAIR_FEATS, chunk), jnp.float32),
            pltpu.VMEM((2, PAIR_FEATS, chunk), out_dtype),
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
    zinit = jnp.zeros(pair_feats.shape, out_dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(pair_feats.shape, out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the carry scheme REQUIRES sequential grid execution
            dimension_semantics=("arbitrary",),
        ),
    )(tile_start, tile_count, pair_feats, fwd_tiles, grad_tiles, zinit)
