"""Static-shape tile binning for the Pallas rasterizer — v5 (all views, one sort).

The CUDA rasterizer radix-sorts (tile, depth) pairs on-GPU, once per
(batch, view) launch. v5 bins EVERY view of a batch element in one shot:

1. each (gaussian, view) emits up to ``win^2`` base-window candidates, and
   the K gaussians per view whose tile span most exceeds the base window
   emit their remaining tiles from a second ``big_win^2`` fallback window
   (top-K selection; only spans exceeding the big window or the K pool are
   dropped, and they are counted in ``overflow``). Every candidate carries
   a single uint32 key ``(view*n_tiles + tile) << db | depth_bits`` where
   ``depth_bits`` are the top ``db = 32 - ceil_log2(V*n_tiles)`` bits of the
   (positive) f32 view depth — IEEE bits of positive floats are monotone,
   so ONE flat non-stable sort orders every (view, tile) segment
   front-to-back at once (ties compose in arbitrary order, same as the CUDA
   radix sort's key truncation; the sign bit keeps depth_bits below the
   all-ones invalid key),
2. the sort payload is the flat candidate index ``(v*N + n)*maxt + w`` —
   built explicitly by broadcast arithmetic, paired positionally with the
   keys,
3. per-(view, tile) segment starts come from ONE searchsorted with
   ``V*n_tiles`` queries over the sorted keys (few queries — cheap); the
   segments are *unaligned* to the chunk grid and share chunks across tile
   AND view boundaries (the Pallas kernels mask partial chunks and the
   backward kernel merges boundary chunks through a sequential VMEM carry),
4. pair features are placed by a single [budget, 16] row gather of the
   sorted-prefix payloads (invalid candidates sort to the end; one global
   ``pair_budget`` bounds all downstream work across all views — per-view
   imbalance is absorbed instead of padded — and anything clipped is
   counted in ``overflow``, never silent),
5. the placement's custom VJP routes the sorted gradient stream back to
   candidate order either by inverting the sort permutation with one more
   ``sort`` + gather (default — payloads are a permutation of iota, so
   sorting them recovers each candidate's sorted position) or by one
   unique-index permutation scatter (``regroup_mode='scatter'``); either
   way gradients then regroup per (view, gaussian) with a reshape + MXU
   fold matmul.

Replaces the per-view launch loop of
/root/reference/core/gaussians/gs.py:62-110 (one CUDA rasterizer call per
view) with a single sort/gather pipeline whose cost amortizes over views.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sigman_release_tpu.ops.rasterizer.preprocess import ProjectedGaussians

# pair feature row layout (16 f32 lanes, last 6 padding)
F_MX, F_MY, F_CA, F_CB, F_CC, F_R, F_G, F_B, F_OPA, F_DEPTH = range(10)
PAIR_FEATS = 16

INVALID = jnp.uint32(0xFFFFFFFF)

# compositing alpha floor (renderCUDA's 1/255 cut); pallas_forward imports
# this — it is ALSO the exact-pair cull rule: a (gaussian, tile) pair whose
# max alpha over the tile is below the floor contributes exactly zero to
# image AND gradient, so binning may drop it without changing any output
ALPHA_MIN = 1.0 / 255.0
# conservative slack on the q-threshold (power margin 5e-3 — orders of
# magnitude above the f32 noise between this rect-min and the kernel's
# per-pixel quadratic evaluation)
_EXACT_MARGIN = 1e-2


def _rect_min_q(mx, my, ca, cb, cc, tx, ty, tile_size):
    """Exact min of the conic quadratic q(d) = d^T C d over a tile's pixel
    rectangle (pixel centers [t*ts, t*ts + ts-1]); d = pixel - mean.

    For a PD conic the min is 0 when the mean lies inside the rect,
    otherwise it is attained on one of the 4 edges, where q restricted to
    the edge is a 1-D quadratic with a clampable closed-form argmin. This
    is the ellipse-vs-tile intersection test the bbox span lacks: it culls
    the ~2/3 of bbox candidates whose ellipse never reaches the tile.
    """
    txf = tx.astype(jnp.float32) * tile_size
    tyf = ty.astype(jnp.float32) * tile_size
    rx0 = txf - mx
    rx1 = rx0 + (tile_size - 1.0)
    ry0 = tyf - my
    ry1 = ry0 + (tile_size - 1.0)

    cas = jnp.maximum(ca, 1e-12)
    ccs = jnp.maximum(cc, 1e-12)

    def q(x, y):
        return (ca * x + 2.0 * cb * y) * x + cc * y * y

    def edge_x(x):                        # x fixed, y free in [ry0, ry1]
        y = jnp.clip(-cb * x / ccs, ry0, ry1)
        return q(x, y)

    def edge_y(y):                        # y fixed, x free in [rx0, rx1]
        x = jnp.clip(-cb * y / cas, rx0, rx1)
        return q(x, y)

    qmin = jnp.minimum(
        jnp.minimum(edge_x(rx0), edge_x(rx1)),
        jnp.minimum(edge_y(ry0), edge_y(ry1)),
    )
    inside = (rx0 <= 0.0) & (rx1 >= 0.0) & (ry0 <= 0.0) & (ry1 >= 0.0)
    return jnp.where(inside, 0.0, qmin)


class TileBinning(NamedTuple):
    """Binning result: per-(view, tile) segments + placement ingredients.

    Placement (the [budget, 16] gather producing the dense pair stream) and
    its gradient regroup are NOT performed here — they live inside the
    renderer's single custom-VJP boundary (render._composite) so the
    backward pair-gradient stream can use a narrower dtype internally
    without crossing a custom_vjp cotangent-dtype check.

    Two placement layouts (``dims[-1]``, the static per-view budget ``vb``):

    * ``vb == 0`` (global): the dense stream is the sorted prefix — one
      global ``pair_budget`` absorbs per-view imbalance, but the backward
      regroup gathers from the FULL [budget, 16] grad table, which crosses
      the ~32 MB TPU gather cache cliff for V >~ 4 at avatar scale
      (measured 1.6 -> 6.6 ns/row, PERF.md);
    * ``vb > 0`` (per-view regions): each view's pairs are remapped to a
      fixed chunk-aligned region ``[v*vb, (v+1)*vb)`` of the dense stream,
      so the regroup gathers per view from a STATIC <= vb-row table slice
      that stays under the cliff. A view needs > vb pairs -> clipped and
      counted in ``overflow`` (the global mode would have absorbed it if
      another view ran light).
    """

    feats16: jnp.ndarray       # [V*N, 16] f32 per-(view, gaussian) pair rows
    feats_big: jnp.ndarray     # [V*K, 16] f32 top-K fallback pool rows (a
    #                            copy of feats16[rowsel] — placement reads B
    #                            candidates from it so their row id is pure
    #                            arithmetic in the payload, no per-slot
    #                            pool-indirection gather)
    valid_prefix: jnp.ndarray  # [budget] bool — dense slot holds a real pair
    pay_prefix: jnp.ndarray    # [budget] i32 dense-slot candidate indices
    payload: jnp.ndarray       # [P] i32 sorted flat candidate indices
    total_valid: jnp.ndarray   # [] i32 valid candidates (<= P)
    sel_flat: jnp.ndarray      # [V*K] i32 per-view fallback gaussian ids
    seg_bounds: jnp.ndarray    # [V+1] i32 view segment bounds in sorted order
    tile_start: jnp.ndarray    # [V*n_tiles] i32 absolute pair index (NOT
    #                            chunk-aligned — kernels mask partials)
    tile_count: jnp.ndarray    # [V*n_tiles] i32 pairs in the segment
    overflow: jnp.ndarray      # [] i32 — dropped (gaussian, tile) pairs
    dims: tuple                # static (v, n, k_big, a_slots, b_slots,
    #                            budget, vb) — vb == 0 means global layout


def _float0(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def place_pairs(feats16, feats_big, valid_prefix, pay_prefix, dims):
    """Gather dense-slot pair rows into the [budget, 16] stream.

    ``pay_prefix`` carries each dense slot's flat candidate index, which
    encodes (view, gaussian-or-pool-slot, window-slot) by construction —
    so the feats row id is PURE ARITHMETIC (A-window: ``pay // a_slots``;
    B-window: ``n + (pay - c_a) // b_slots`` into the appended ``feats_big``
    pool copy) that XLA fuses into the gather's index computation. (The
    previous separate [budget] row-id materializations were the two
    dominant V=10 ops — 16.6 ms each, xprof round 4: an s32 gather for the
    dense payload and a pool-indirection gather for B rows.) Empty /
    past-stream / region-padding slots take the zero row.

    Per-view layout (vb > 0): every slot of region v draws from view v's
    own [N+K+1, 16] table (slices of feats16/feats_big), so the gathers
    stay on the fast (<= ~32 MB) gather path — ONE gather from the full
    [V*N, 16] table crosses the cache cliff at V >~ 4 avatar scale
    (measured 49.5 ms/iter at V=10, ~20 ns/row — xprof, PERF.md round 4).
    """
    v, n, k_big, a_slots, b_slots, budget, vb = dims
    f = feats16.shape[1]
    c_a = v * n * a_slots
    zrow = jnp.zeros((1, f), feats16.dtype)
    is_a = pay_prefix < c_a
    if vb:
        rows_a = pay_prefix // a_slots \
            - (jnp.arange(v, dtype=jnp.int32) * n).repeat(vb)
        rows_b = (pay_prefix - c_a) // b_slots \
            - (jnp.arange(v, dtype=jnp.int32) * k_big).repeat(vb) + n
        rows = jnp.where(valid_prefix, jnp.where(is_a, rows_a, rows_b),
                         n + k_big).reshape(v, vb)
        outs = []
        for vi in range(v):
            src = jnp.concatenate([
                feats16[vi * n:(vi + 1) * n],
                feats_big[vi * k_big:(vi + 1) * k_big], zrow])
            outs.append(src[rows[vi]])
        return jnp.concatenate(outs, axis=0)
    rows = jnp.where(is_a, pay_prefix // a_slots,
                     v * n + (pay_prefix - c_a) // b_slots)
    idx = jnp.where(valid_prefix, rows, v * (n + k_big))
    src = jnp.concatenate([feats16, feats_big, zrow])
    return src[idx]


def slot_sum_fold(x, slots, f):
    # [R*slots, f] -> [R, slots*f] is a FREE reshape (same row-major
    # bytes), and the slot reduction is then ONE MXU matmul against a
    # constant 0/1 fold matrix with f32 accumulation. (A ones-vector
    # contraction over a [R, slots, f] axis-1 reshape lowered to an f32
    # convert + column-major relayout + VPU reduce chain — ~1.9 ms at
    # the V=1 bench — because XLA re-lays-out the gather result it
    # wants to reduce; the matmul form keeps the gather's own layout.)
    x2 = x.reshape(-1, slots * f)
    wi = jax.lax.broadcasted_iota(jnp.int32, (slots * f, f), 0) % f
    ci = jax.lax.broadcasted_iota(jnp.int32, (slots * f, f), 1)
    fold = (wi == ci).astype(x.dtype)
    return jax.lax.dot_general(
        x2, fold, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def regroup_pair_grads(g, payload, total_valid, sel_flat, dims,
                       mode: str = "sort", seg_bounds=None):
    """Transpose of ``place_pairs``: stream gradients -> d(feats16) [V*N,16].

    ``g`` is the pair-gradient stream in dense-slot order ([budget, 16],
    f32 OR bf16 — the dominant cost here is the random row gather from the
    budget-sized table, and a bf16 table runs ~4x faster on TPU; sums are
    always f32). Requires the stream to be exact zeros at non-pair slots
    (the backward kernel zero-initializes its output), so no validity
    mask is needed.

    ``mode``: how the dense stream is routed back to candidate order —
    * ``"sort"``: invert the sort permutation with one more 1-D sort
      (payload is a permutation of iota, so sorting it recovers each
      candidate's sorted position), then one row gather;
    * ``"scatter"``: one permutation scatter ``zeros.at[payload].set(g)``
      (indices are unique by construction) — no second sort. Whether this
      beats the sort depends on how the backend lowers unique-index
      scatter; A/B'd on-chip, see PERF.md.

    Per-view layout (``dims[-1] = vb > 0``, requires ``seg_bounds``): the
    sorted positions are first converted to view-local region slots, then
    each view's candidates gather from a STATIC [vb, 16] slice of ``g`` —
    V small-table gathers on the fast (<= ~32 MB) gather path instead of
    one gather from the full [budget, 16] table past the cache cliff.
    """
    v, n, k_big, a_slots, b_slots, budget, vb = dims
    c_a = v * n * a_slots
    P = c_a + v * k_big * b_slots      # full candidate count
    f = g.shape[1]

    def candidate_positions():
        """[P] sorted-stream position of every candidate (sentinel when the
        candidate is not in the stream — routes to the pad row downstream).

        Compacted streams (payload shorter than P — bin_gaussians
        ``compact``): invert the C-sized permutation with a C-sized sort,
        then one unique 1-D scatter expands positions back to candidate
        order; pad payloads (>= P by construction) drop out of bounds."""
        C = payload.shape[0]
        if C < P:
            pay_asc, pos_c = lax.sort(
                (payload, jnp.arange(C, dtype=jnp.int32)), is_stable=False,
                num_keys=1,
            )
            return jnp.full((P,), jnp.int32(2**30)).at[pay_asc].set(
                pos_c, unique_indices=True, mode="drop")
        _, pos = lax.sort(
            (payload, jnp.arange(P, dtype=jnp.int32)), is_stable=False,
            num_keys=1,
        )
        return pos

    if vb:
        assert seg_bounds is not None
        pos = candidate_positions()
        seg_start = seg_bounds[:v]                         # [V]
        seg_len = seg_bounds[1:] - seg_bounds[:-1]         # [V]
        lim = jnp.minimum(seg_len, vb)
        # candidates are view-major in BOTH windows, so a [V, .] reshape
        # lines each row up with its view; valid candidates of view v sit
        # at sorted positions [seg_start[v], seg_start[v] + seg_len[v]),
        # invalid ones at >= total_valid >= any seg end — so the single
        # test local < lim routes invalid AND region-clipped rows to the
        # per-slice pad row vb
        loc_a = pos[:c_a].reshape(v, n * a_slots) - seg_start[:, None]
        rows_a = jnp.where(loc_a < lim[:, None], loc_a, vb)
        loc_b = pos[c_a:].reshape(v, k_big * b_slots) - seg_start[:, None]
        rows_b = jnp.where(loc_b < lim[:, None], loc_b, vb)
        zrow = jnp.zeros((1, f), g.dtype)
        sel = sel_flat.reshape(v, k_big)
        outs = []
        for vi in range(v):
            # static slice: the gather operand is a [vb+1, 16] table that
            # stays under the gather cache cliff (the concat materializes
            # it — XLA cannot fold the slice back into the big buffer)
            gv = jnp.concatenate([g[vi * vb:(vi + 1) * vb], zrow])
            da = slot_sum_fold(gv[rows_a[vi]], a_slots, f)     # [n, f]
            db = slot_sum_fold(gv[rows_b[vi]], b_slots, f)     # [k_big, f]
            outs.append(da.at[sel[vi]].add(db))
        return jnp.stack(outs).reshape(v * n, f)
    if mode == "scatter":
        nvalid = jnp.minimum(total_valid, budget)
        slot = jax.lax.broadcasted_iota(jnp.int32, (budget,), 0)
        # budget may exceed the candidate count (small scenes / generous
        # budgets — bin_gaussians pads keys, not the payload): pad the
        # payload so the [budget]-shaped where is well-formed; padded slots
        # satisfy slot >= nvalid and route to the dump row anyway.
        # (Compacted streams arrive exactly [budget]-sized; their >= P pad
        # payload values sit past nvalid and also route to the dump row.)
        pay_b = payload[:budget]
        if budget > payload.shape[0]:
            pay_b = jnp.concatenate(
                [payload,
                 jnp.zeros((budget - payload.shape[0],), payload.dtype)])
        # clipped/invalid slots all target one dump row past the end
        tgt = jnp.where(slot < nvalid, pay_b, P)
        d_cand = jnp.zeros((P + 1, f), g.dtype).at[tgt].set(
            g, unique_indices=True, mode="drop")[:P]
        d_a = slot_sum_fold(d_cand[:c_a], a_slots, f).reshape(v, n, f)
        d_b = slot_sum_fold(d_cand[c_a:], b_slots, f).reshape(v, k_big, f)
        sel = sel_flat.reshape(v, k_big)
        d_feats = jax.vmap(lambda da, s, db: da.at[s].add(db))(d_a, sel, d_b)
        return d_feats.reshape(v * n, f)

    # payload is a permutation of iota(P) (or a compacted subset): sorting
    # it ascending recovers, per flat candidate index, its position in the
    # sorted stream
    pos = candidate_positions()
    # invalid/clipped candidates ALL read the single pad row instead of
    # scattered zero rows in the stream tail — halves the random HBM reads
    # of this gather (the dominant backward cost outside the kernel)
    rows = jnp.where(pos < jnp.minimum(total_valid, budget), pos, budget)
    gpad = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)])

    d_a = slot_sum_fold(gpad[rows[:c_a]], a_slots, f).reshape(v, n, f)
    d_b = slot_sum_fold(gpad[rows[c_a:]], b_slots, f).reshape(v, k_big, f)
    sel = sel_flat.reshape(v, k_big)
    # K is small (n // big_frac): a per-view K-row scatter-add is cheap
    d_feats = jax.vmap(lambda da, s, db: da.at[s].add(db))(d_a, sel, d_b)
    return d_feats.reshape(v * n, f)


def bin_gaussians(
    proj: ProjectedGaussians,  # fields [V, N] / [V, N, k] (vmapped projection)
    colors: jnp.ndarray,      # [N,3]
    opacity: jnp.ndarray,     # [N]
    img_h: int,
    img_w: int,
    tile_size: int = 32,
    max_tiles_per_gaussian: int = 9,
    chunk: int = 128,
    pair_budget: int | None = None,
    big_win: int = 6,
    big_frac: int = 32,
    exact_radius: bool = True,
    per_view_budget: bool = False,
    compact: bool = False,
) -> TileBinning:
    """``per_view_budget``: split ``pair_budget`` into V fixed chunk-aligned
    regions of the dense stream (one per view) instead of one shared global
    prefix — see TileBinning's layout note for the gather-cliff rationale."""
    assert proj.mean2d.ndim == 3, "bin_gaussians wants view-batched projections"
    v_views, n = proj.mean2d.shape[:2]
    ntx = -(-img_w // tile_size)
    nty = -(-img_h // tile_size)
    n_tiles = ntx * nty
    total_tiles = v_views * n_tiles
    tb = max(1, math.ceil(math.log2(total_tiles)))
    db = 32 - tb                              # depth bits below the tile id
    assert db >= 16, "too many (view, tile) programs for a 32-bit key"
    win = int(math.isqrt(max_tiles_per_gaussian))
    assert win * win == max_tiles_per_gaussian, "window must be square"
    assert big_win >= win
    a_slots = win * win
    b_slots = big_win * big_win
    k_big = min(n, max(-(-n // big_frac), 8))  # fallback pool per view (<= n)
    if pair_budget is None:
        pair_budget = 5 * n * v_views
    if per_view_budget:
        assert pair_budget >= v_views, (
            f"pair_budget={pair_budget} < v_views={v_views}: per-view "
            "regions would get a zero budget and silently overflow "
            "every pair")
        vb = max(chunk, -(-(pair_budget // v_views) // chunk) * chunk)
        budget = vb * v_views
    else:
        vb = 0
        budget = -(-pair_budget // chunk) * chunk

    mean_x = proj.mean2d[..., 0]              # [V,N]
    mean_y = proj.mean2d[..., 1]
    radius = proj.radius
    valid = proj.valid
    opa_v = jnp.where(valid, opacity[None], 0.0)              # [V,N]
    # exact-cull threshold (shared with the radius scaling below): keep a
    # (gaussian, tile) pair iff some tile pixel can reach alpha >= ALPHA_MIN,
    # i.e. min_rect q <= 2 log(opa/ALPHA_MIN)
    qt_raw = 2.0 * (jnp.log(jnp.maximum(opa_v, 1e-12))
                    - float(np.log(ALPHA_MIN)))

    if exact_radius:
        # opacity-exact cutoff radius. The CUDA preprocess uses a fixed
        # 3-sigma screen radius, which CLIPS real contributions between
        # 3 and 3.33 sigma for opaque gaussians (the 1/255 alpha floor is
        # reached at sqrt(2 ln(255 opa)) sigma) and wastes tiles on dim
        # ones. Scaling the radius to the exact isocontour makes the output
        # independent of the tile size and equal to the pure alpha-floor
        # rule (dense oracle with tile_size=0) — a strict improvement over
        # the reference's truncation. proj.radius carries ceil(3 sigma), so
        # the scale keeps its conservative ceil slack.
        cut = jnp.sqrt(jnp.maximum(qt_raw, 1e-4)) * (1.0 / 3.0)
        radius = radius * cut

    # ---- tile spans ----------------------------------------------------------
    x0 = jnp.clip(jnp.floor((mean_x - radius) / tile_size), 0, ntx)
    y0 = jnp.clip(jnp.floor((mean_y - radius) / tile_size), 0, nty)
    x1 = jnp.clip(jnp.floor((mean_x + radius) / tile_size) + 1, 0, ntx)
    y1 = jnp.clip(jnp.floor((mean_y + radius) / tile_size) + 1, 0, nty)
    x0, y0, x1, y1 = (a.astype(jnp.int32) for a in (x0, y0, x1, y1))
    x1a = jnp.minimum(x1, x0 + win)
    y1a = jnp.minimum(y1, y0 + win)
    span = jnp.where(valid, (x1 - x0) * (y1 - y0), 0)
    a_area = (x1a - x0) * (y1a - y0)
    wanted = jnp.sum(span).astype(jnp.int32)

    # depth > 0.2 for every valid gaussian, so the u32 bit pattern is a
    # positive int whose order matches the float order; the zero sign bit
    # keeps depth_bits strictly below all-ones (never collides with INVALID)
    depth_bits = lax.shift_right_logical(
        lax.bitcast_convert_type(proj.depth.astype(jnp.float32), jnp.uint32),
        jnp.uint32(32 - db),
    )
    view_base = (jnp.arange(v_views, dtype=jnp.int32) * n_tiles)[:, None, None]

    q_thresh = qt_raw + _EXACT_MARGIN
    ca_f = proj.conic[..., 0]
    cb_f = proj.conic[..., 1]
    cc_f = proj.conic[..., 2]

    # ---- base-window candidates (win x win, every gaussian) ------------------
    li = jnp.arange(a_slots, dtype=jnp.int32)
    tx = x0[..., None] + li % win             # [V,N,a_slots]
    ty = y0[..., None] + li // win
    cand_bbox_a = ((tx < x1a[..., None]) & (ty < y1a[..., None])
                   & valid[..., None])
    qmin_a = _rect_min_q(mean_x[..., None], mean_y[..., None],
                         ca_f[..., None], cb_f[..., None], cc_f[..., None],
                         tx, ty, tile_size)
    cand_ok_a = cand_bbox_a & (qmin_a <= q_thresh[..., None])
    tile_id = (view_base + ty * ntx + tx).astype(jnp.uint32)
    keys_a = jnp.where(
        cand_ok_a,
        lax.shift_left(tile_id, jnp.uint32(db)) | depth_bits[..., None],
        INVALID,
    ).reshape(-1)
    # flat candidate index (v*N + n)*a_slots + w, positionally paired
    vn_a = (jnp.arange(v_views, dtype=jnp.int32)[:, None, None] * n
            + jnp.arange(n, dtype=jnp.int32)[None, :, None])      # [V,N,1]
    payload_a = (vn_a * a_slots + li).reshape(-1)

    # ---- fallback candidates (big_win x big_win, top-K spans per view) -------
    # gaussians whose span exceeds the base window get their remaining tiles
    # from a second candidate set over the K largest offenders per view; only
    # what exceeds BOTH windows (or the K pool) is dropped — and counted.
    score = jnp.where(valid, span - a_area, 0)            # missing tiles
    # top-K per view via one flat 1-D sort (lax.top_k and 2-D batched sorts
    # are an order of magnitude slower on TPU — see PERF.md): key packs
    # (view, descending clamped score), payload is the gaussian index
    skey = (jnp.arange(v_views, dtype=jnp.int32)[:, None] * 1024
            + (1023 - jnp.minimum(score, 1023))).reshape(-1)
    gidx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                            (v_views, n)).reshape(-1)
    _, sel_sorted = lax.sort((skey, gidx), is_stable=False, num_keys=1)
    sel = sel_sorted.reshape(v_views, n)[:, :k_big]       # [V,K]
    # one packed row gather for all per-gaussian fields (per-field 2-D
    # take_along_axis lowers to slow scalar-gather paths); float fields ride
    # as bitcast int32 lanes
    def f2i(x):
        return lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)

    packed = jnp.stack(
        [x0, y0, x1, y1,
         lax.bitcast_convert_type(depth_bits, jnp.int32),
         valid.astype(jnp.int32),
         f2i(mean_x), f2i(mean_y), f2i(ca_f), f2i(cb_f), f2i(cc_f),
         f2i(q_thresh)],
        axis=-1,
    ).reshape(v_views * n, 12)
    rowsel = (jnp.arange(v_views, dtype=jnp.int32)[:, None] * n
              + sel).reshape(-1)
    pb = packed[rowsel].reshape(v_views, k_big, 12)
    x0b, y0b, x1b, y1b = pb[..., 0], pb[..., 1], pb[..., 2], pb[..., 3]
    depth_bits_b = lax.bitcast_convert_type(pb[..., 4], jnp.uint32)
    valid_b = pb[..., 5] > 0

    def i2f(x):
        return lax.bitcast_convert_type(x, jnp.float32)

    mxb, myb = i2f(pb[..., 6]), i2f(pb[..., 7])
    cab, cbb, ccb = i2f(pb[..., 8]), i2f(pb[..., 9]), i2f(pb[..., 10])
    q_thresh_b = i2f(pb[..., 11])
    x1bc = jnp.minimum(x1b, x0b + big_win)
    y1bc = jnp.minimum(y1b, y0b + big_win)
    lib = jnp.arange(b_slots, dtype=jnp.int32)
    lxb, lyb = lib % big_win, lib // big_win
    txb = x0b[..., None] + lxb                # [V,K,b_slots]
    tyb = y0b[..., None] + lyb
    # exclude the base-window block (emitted by the A set for everyone)
    cand_bbox_b = ((txb < x1bc[..., None]) & (tyb < y1bc[..., None])
                   & valid_b[..., None]
                   & ~((lxb < win) & (lyb < win)))
    qmin_b = _rect_min_q(mxb[..., None], myb[..., None],
                         cab[..., None], cbb[..., None], ccb[..., None],
                         txb, tyb, tile_size)
    cand_ok_b = cand_bbox_b & (qmin_b <= q_thresh_b[..., None])
    tile_id_b = ((jnp.arange(v_views, dtype=jnp.int32)[:, None, None]
                  * n_tiles) + tyb * ntx + txb).astype(jnp.uint32)
    keys_b = jnp.where(
        cand_ok_b,
        lax.shift_left(tile_id_b, jnp.uint32(db)) | depth_bits_b[..., None],
        INVALID,
    ).reshape(-1)
    c_a = v_views * n * a_slots
    payload_b = (c_a
                 + (jnp.arange(v_views, dtype=jnp.int32)[:, None, None] * k_big
                    + jnp.arange(k_big, dtype=jnp.int32)[None, :, None])
                 * b_slots + lib).reshape(-1)

    keys = jnp.concatenate([keys_a, keys_b])
    payload = jnp.concatenate([payload_a, payload_b])
    cand_ok = jnp.concatenate([cand_ok_a.reshape(-1), cand_ok_b.reshape(-1)])
    if compact:
        # Compact valid candidates into the static budget-sized buffer
        # BEFORE sorting: ~73% of emitted slots are invalid at avatar scale
        # and both the binning sort and the backward inverse-perm sort
        # otherwise carry them. One linear cumsum + two unique 1-D scatters
        # buy a ~2x shorter sort each way. Valid candidates beyond the
        # budget drop in emission (view-major) order instead of sorted-key
        # order — same count, different membership, counted in overflow
        # either way (only differs when the budget actually clips).
        p0 = keys.shape[0]
        cs = jnp.cumsum(cand_ok.astype(jnp.int32))
        # invalid slots get globally unique out-of-bounds targets (above
        # any valid cs-1 <= p0-1) so unique_indices holds; mode="drop"
        # discards them AND any valid candidate past the budget
        dst = jnp.where(cand_ok, cs - 1,
                        p0 + jnp.arange(p0, dtype=jnp.int32))
        keys = jnp.full((budget,), INVALID, jnp.uint32).at[dst].set(
            keys, unique_indices=True, mode="drop")
        # pad slots carry unique out-of-range candidate ids (>= p0) so the
        # backward's pos scatter stays unique and drops them
        payload = (p0 + jnp.arange(budget, dtype=jnp.int32)).at[dst].set(
            payload, unique_indices=True, mode="drop")
    keys_s, pay_s = lax.sort((keys, payload), is_stable=False, num_keys=1)
    # the feats row of every sorted slot is DERIVED from the payload
    # (candidate index encodes (view, gaussian, window-slot) by construction)
    # instead of riding the sort as a third operand — sort cost is ~linear
    # in operand count. A-window: row = pay // a_slots; B-window: row =
    # rowsel[(pay - c_a) // b_slots] (a gather from the tiny [V*K] pool).
    # ---- per-(view, tile) segments (few queries — cheap) ---------------------
    p_total = keys_s.shape[0]
    bounds = lax.shift_left(
        jnp.arange(total_tiles, dtype=jnp.uint32), jnp.uint32(db)
    )
    starts = jnp.searchsorted(keys_s, bounds, side="left").astype(jnp.int32)
    total_valid = jnp.sum(cand_ok).astype(jnp.int32)
    ends = jnp.concatenate([starts[1:], total_valid[None]])
    seg_bounds = jnp.concatenate(
        [starts[0::n_tiles], total_valid[None]])              # [V+1]
    # overflow counts REAL drops only: bbox pairs beyond the emission
    # windows / K-pool, plus budget clipping. Exactness-culled pairs (bbox
    # hits whose ellipse misses the tile) are provably zero-contribution,
    # not drops.
    emitted_bbox = (jnp.sum(cand_bbox_a) + jnp.sum(cand_bbox_b)) \
        .astype(jnp.int32)
    overflow_base = wanted - emitted_bbox

    if per_view_budget:
        # dense stream = V fixed chunk-aligned regions; view v's sorted
        # segment [seg_start, seg_start+seg_len) maps to [v*vb, v*vb+lim).
        # Region slots are CONTIGUOUS in sorted order, so the dense payload
        # is V dynamic slices — NOT a gather (a [budget] s32 gather here
        # measured 16.6 ms at V=10, the single biggest glue op; xprof
        # round 4). pay_s is padded by vb so no window needs the
        # out-of-bounds start clamp (which would silently shift valid rows).
        seg_start = seg_bounds[:v_views]
        seg_len = seg_bounds[1:] - seg_bounds[:-1]
        lim = jnp.minimum(seg_len, vb)
        li_vb = jnp.arange(vb, dtype=jnp.int32)[None, :]       # [1, vb]
        valid_prefix = (li_vb < lim[:, None]).reshape(-1)
        pay_pad = jnp.concatenate([pay_s, jnp.zeros((vb,), pay_s.dtype)])
        pay_pref = jnp.concatenate([
            lax.dynamic_slice(pay_pad, (seg_start[vi],), (vb,))
            for vi in range(v_views)
        ])                                                     # [budget]
        overflow = overflow_base + jnp.sum(jnp.maximum(seg_len - vb, 0))
        if compact:
            # candidates the pre-sort compaction dropped never reach the
            # segments, so they are invisible to the region-clip count
            overflow = overflow + jnp.maximum(total_valid - budget, 0)
        # remap tile segments into their view's region
        seg_start_t = jnp.repeat(seg_start, n_tiles)
        lim_t = jnp.repeat(lim, n_tiles)
        base_t = jnp.repeat(jnp.arange(v_views, dtype=jnp.int32) * vb,
                            n_tiles)
        ls = jnp.clip(starts - seg_start_t, 0, lim_t)
        le = jnp.clip(ends - seg_start_t, 0, lim_t)
        tile_start = base_t + ls
        tile_count = le - ls
    else:
        # (the budget may exceed the total emitted candidate count — small
        # scenes / generous budgets: pad with INVALID keys so the dense
        # stream is always exactly `budget` rows; extra rows place as zeros)
        keys_pref = keys_s[:budget]
        if budget > p_total:
            pad = budget - p_total
            keys_pref = jnp.concatenate(
                [keys_s, jnp.full((pad,), INVALID, jnp.uint32)])
            pay_pref = jnp.concatenate(
                [pay_s, jnp.zeros((pad,), pay_s.dtype)])[:budget]
        else:
            pay_pref = pay_s[:budget]
        valid_prefix = keys_pref != INVALID
        overflow = overflow_base + jnp.maximum(total_valid - budget, 0)
        tile_start = jnp.minimum(starts, budget)
        tile_count = jnp.minimum(ends, budget) - tile_start

    # ---- pair feature rows (one gather) ---------------------------------------
    colb = jnp.broadcast_to(colors[None], (v_views, n, 3))
    opab = jnp.broadcast_to(jnp.where(valid, opacity[None], 0.0), (v_views, n))
    zero = jnp.zeros_like(proj.depth)
    feats16 = jnp.stack(
        [mean_x, mean_y,
         proj.conic[..., 0], proj.conic[..., 1], proj.conic[..., 2],
         colb[..., 0], colb[..., 1], colb[..., 2],
         opab,
         proj.depth,
         zero, zero, zero, zero, zero, zero],
        axis=-1,
    ).astype(jnp.float32).reshape(v_views * n, PAIR_FEATS)     # [V*N,16]

    return TileBinning(
        feats16=feats16,
        feats_big=feats16[rowsel],
        valid_prefix=valid_prefix,
        pay_prefix=pay_pref,
        payload=pay_s,
        total_valid=total_valid,
        sel_flat=sel.reshape(-1),
        seg_bounds=seg_bounds,
        tile_start=tile_start,
        tile_count=tile_count,
        overflow=overflow,
        dims=(v_views, n, k_big, a_slots, b_slots, budget, vb),
    )
