"""Pallas tile rasterizer vs dense golden model — pixels and gradients.

Runs the kernels in interpret mode on CPU; the same code compiles via Mosaic
on TPU (exercised by bench.py / __graft_entry__).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigman_release_tpu.ops.rasterizer import (
    RasterizeConfig,
    build_cov3d,
    rasterize_single,
    render_dense,
)

from utils import orbit_rig, random_gaussians, tan_half_fov

TH = tan_half_fov()


def _cfg(hw=64, chunk=32, interpret=True):
    return RasterizeConfig(
        img_h=hw, img_w=hw, tan_half_fovx=TH, tan_half_fovy=TH,
        chunk=chunk, interpret=interpret,
    )


def _inputs(n=96, seed=0):
    g = random_gaussians(n, seed=seed)
    cov3d = build_cov3d(jnp.asarray(g["scales"]), jnp.asarray(g["rotations"]))
    cam_view, cam_view_proj, _ = orbit_rig(2)
    return (
        jnp.asarray(g["means3d"]), cov3d, jnp.asarray(g["colors"]),
        jnp.asarray(g["opacity"]), cam_view, cam_view_proj,
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_forward_matches_dense(seed):
    means, cov3d, colors, opa, cv, cvp = _inputs(seed=seed)
    cfg = _cfg()
    out = rasterize_single(means, cov3d, colors, opa, cv, cvp,
                           jnp.ones(3), cfg)
    assert int(out["overflow"]) == 0
    for v in range(cv.shape[0]):
        ref = render_dense(means, cov3d, colors, opa, cv[v], cvp[v],
                           TH, TH, cfg.img_h, cfg.img_w, bg_color=jnp.ones(3),
                           tile_size=0)
        # 5e-5: the kernel evaluates the Gaussian exponent as an expanded
        # quadratic (one MXU matmul, pallas_forward._chunk_alpha) — a few
        # e-5 of f32 rounding vs the oracle's factored form
        np.testing.assert_allclose(
            np.asarray(out["image"][v]), np.asarray(ref["image"]),
            atol=5e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["alpha"][v]), np.asarray(ref["alpha"]), atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["depth"][v]), np.asarray(ref["depth"]),
            atol=1e-4, rtol=1e-4,
        )


@pytest.mark.parametrize("grad_bf16,tol", [(False, 5e-4), (True, 8e-3)])
def test_backward_matches_dense(grad_bf16, tol):
    """Strict f32 pair-grad stream matches the oracle to 5e-4 (normalized);
    the default bf16 stream (grad_stream_bf16=True — ~4x faster regroup on
    TPU) rounds each pair gradient to bf16 (~0.4% rel) before the f32 sums,
    measured <= 0.8% normalized on this workload."""
    means, cov3d, colors, opa, cv, cvp = _inputs(n=64)
    cfg = _cfg(hw=32)._replace(grad_stream_bf16=grad_bf16)
    key = jax.random.PRNGKey(0)
    # random cotangent image to probe the full jacobian
    g_img = jax.random.normal(key, (cv.shape[0], 3, 32, 32))
    g_alpha = jax.random.normal(key, (cv.shape[0], 1, 32, 32))

    def loss_pallas(m, c, col, o):
        out = rasterize_single(m, c, col, o, cv, cvp, jnp.ones(3), cfg)
        return jnp.sum(out["image"] * g_img) + jnp.sum(out["alpha"] * g_alpha)

    def loss_dense(m, c, col, o):
        tot = 0.0
        for v in range(cv.shape[0]):
            ref = render_dense(m, c, col, o, cv[v], cvp[v], TH, TH, 32, 32,
                               bg_color=jnp.ones(3), tile_size=0)
            tot += jnp.sum(ref["image"] * g_img[v]) + jnp.sum(
                ref["alpha"] * g_alpha[v]
            )
        return tot

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(means, cov3d, colors, opa)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(means, cov3d, colors, opa)
    names = ["means3d", "cov3d", "colors", "opacity"]
    for name, a, b in zip(names, gp, gd):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), name
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=tol,
                                   err_msg=f"grad mismatch: {name}")


def test_grads_finite_with_culled_gaussians():
    """Behind-camera / near-plane points must not poison the VJP.

    Rows with view-space z ~ 0 (in the camera plane) hit divisions by ~0 in
    project_gaussians; the forward masks them via `valid`, but a zero
    cotangent times an inf partial is NaN — the projection must keep masked
    rows finite (regression: grad(means3d) was NaN whenever any gaussian
    landed near a camera's z=0 plane, where 1/tz and the homogeneous 1/w
    blow up)."""
    means, cov3d, colors, opa, cv, cvp = _inputs(n=64)
    _, _, cam_pos = orbit_rig(2)
    # drop some gaussians exactly onto / just behind each camera: view z = 0
    # (division blows up) and z = -1e-4 (w ~ -1e-7 defeats the +1e-7 guard)
    means = means.at[0].set(jnp.asarray(cam_pos[0]))
    means = means.at[1].set(jnp.asarray(cam_pos[1]))
    means = means.at[2].set(jnp.asarray(cam_pos[0]) * (1.0 + 1e-4))
    cfg = _cfg(hw=32)

    def loss(m, c, col, o):
        out = rasterize_single(m, c, col, o, cv, cvp, jnp.ones(3), cfg)
        return (jnp.sum(out["image"] ** 2) + jnp.sum(out["alpha"])
                + jnp.sum(out["depth"]))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(means, cov3d, colors, opa)
    for name, a in zip(["means3d", "cov3d", "colors", "opacity"], grads):
        a = np.asarray(a)
        assert np.isfinite(a).all(), f"non-finite grad: {name}"
    assert np.abs(np.asarray(grads[0])).max() > 0


def test_overflow_reported_when_budget_tiny():
    means, cov3d, colors, opa, cv, cvp = _inputs(n=512)
    cfg = RasterizeConfig(
        img_h=64, img_w=64, tan_half_fovx=TH, tan_half_fovy=TH,
        chunk=32, interpret=True, pair_budget_factor=1,
    )
    out = rasterize_single(means, cov3d, colors, opa, cv, cvp, jnp.ones(3), cfg)
    # 512 gaussians x multiple tiles each >> budget (512 + per-tile headroom)
    assert int(out["overflow"]) > 0


def test_exact_cull_drops_ellipse_missing_tiles():
    """A thin, highly-anisotropic gaussian spans many tiles by bbox, but its
    ellipse only reaches tiles near its major axis: exact culling must cut
    the pair count vs the bbox span while leaving the image untouched
    (dropped pairs have max alpha < 1/255 — exactly zero contribution)."""
    from sigman_release_tpu.ops.rasterizer import binning as B
    from sigman_release_tpu.ops.rasterizer.preprocess import project_gaussians

    # diagonal needle: large extent along (1,1,0), tiny across
    means = jnp.zeros((1, 3))
    rot = np.array([[[2 ** -0.5, -(2 ** -0.5), 0.0],
                     [2 ** -0.5, 2 ** -0.5, 0.0],
                     [0.0, 0.0, 1.0]]], np.float32)
    scales = jnp.asarray([[0.5, 0.004, 0.004]])
    cov3d = build_cov3d(scales, jnp.asarray(rot))
    colors = jnp.ones((1, 3)) * 0.5
    opa = jnp.ones((1,)) * 0.9
    cv, cvp, _ = orbit_rig(1)

    proj = jax.vmap(lambda a, b: project_gaussians(
        means, cov3d, a, b, TH, TH, 256, 256))(cv, cvp)
    bins = B.bin_gaussians(proj, colors, opa, 256, 256,
                           max_tiles_per_gaussian=9, big_win=8,
                           pair_budget=256)
    span_x0 = int(jnp.clip(
        jnp.floor((proj.mean2d[0, 0, 0] - proj.radius[0, 0]) / 32), 0, 8))
    span_x1 = int(jnp.clip(
        jnp.floor((proj.mean2d[0, 0, 0] + proj.radius[0, 0]) / 32) + 1, 0, 8))
    bbox_span = (span_x1 - span_x0) ** 2          # square bbox for the needle
    valid = int(bins.total_valid)
    assert valid >= 1
    # the diagonal needle's ellipse misses the two off-diagonal corners of
    # its bbox at minimum; typical cut is ~half the bbox tiles
    assert valid < bbox_span, (valid, bbox_span)
    assert int(bins.overflow) == 0               # culled pairs are NOT drops

    # and the rendered image still matches the dense oracle exactly
    # (big_win=8 so the needle's full diagonal span is emitted — at the
    # default 6 the bbox genuinely overflows and the comparison would
    # measure honest drops, not the cull)
    cfg = RasterizeConfig(img_h=256, img_w=256, tan_half_fovx=TH,
                          tan_half_fovy=TH, chunk=32, interpret=True,
                          grad_stream_bf16=False, big_win=8)
    out = rasterize_single(means, cov3d, colors, opa, cv, cvp,
                           jnp.ones(3), cfg)
    assert int(out["overflow"]) == 0
    dense = render_dense(means, cov3d, colors, opa, cv[0], cvp[0],
                         TH, TH, 256, 256, jnp.ones(3))
    # atol looser than the avatar-scale parity tests (2e-5): the needle's
    # mean sits ~200 px outside most tiles it touches, so the tile-local
    # quadratic-coefficient expansion carries ~1e-4 f32 cancellation at
    # this (extreme, untypical) conditioning — unrelated to the cull
    np.testing.assert_allclose(np.asarray(out["image"][0]),
                               np.asarray(dense["image"]), atol=5e-4)


def test_tile16_matches_dense():
    """RasterizeConfig.tile=16: quarter-size pixel tiles run the same math
    (per-pixel compositing rules are tile-independent; only the chunk
    partitioning of the pair stream changes) — image must match the dense
    oracle to f32-rounding tolerance, like tile=32 does."""
    means, cov3d, colors, opa, cv, cvp = _inputs(n=96)
    cfg = _cfg()._replace(tile=16, max_tiles_per_gaussian=16, big_win=10,
                          pair_budget_factor=8)
    out = rasterize_single(means, cov3d, colors, opa, cv, cvp,
                           jnp.ones(3), cfg)
    assert int(out["overflow"]) == 0
    for v in range(cv.shape[0]):
        ref = render_dense(means, cov3d, colors, opa, cv[v], cvp[v],
                           TH, TH, cfg.img_h, cfg.img_w, bg_color=jnp.ones(3),
                           tile_size=0)
        np.testing.assert_allclose(
            np.asarray(out["image"][v]), np.asarray(ref["image"]),
            atol=5e-5, rtol=1e-4,
        )


def test_tile16_backward_matches_dense():
    means, cov3d, colors, opa, cv, cvp = _inputs(n=64)
    cfg = _cfg(hw=32)._replace(tile=16, max_tiles_per_gaussian=16,
                               big_win=10, pair_budget_factor=8,
                               grad_stream_bf16=False)
    key = jax.random.PRNGKey(0)
    g_img = jax.random.normal(key, (cv.shape[0], 3, 32, 32))

    def loss_pallas(m, c, col, o):
        out = rasterize_single(m, c, col, o, cv, cvp, jnp.ones(3), cfg)
        return jnp.sum(out["image"] * g_img)

    def loss_dense(m, c, col, o):
        tot = 0.0
        for v in range(cv.shape[0]):
            ref = render_dense(m, c, col, o, cv[v], cvp[v], TH, TH, 32, 32,
                               bg_color=jnp.ones(3), tile_size=0)
            tot += jnp.sum(ref["image"] * g_img[v])
        return tot

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(means, cov3d, colors, opa)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(means, cov3d, colors, opa)
    for name, a, b in zip(["means3d", "cov3d", "colors", "opacity"], gp, gd):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), name
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                   err_msg=f"grad mismatch: {name}")


def test_budget_exceeding_candidates_pads_clean():
    """pair_budget larger than the total emitted candidate count must pad
    the stream with INVALID rows, not crash or corrupt placement
    (regression: reshape error when budget > candidates)."""
    means, cov3d, colors, opa, cv, cvp = _inputs(n=32)
    cfg = _cfg(hw=32)._replace(pair_budget_factor=64)
    out = rasterize_single(means, cov3d, colors, opa, cv, cvp,
                           jnp.ones(3), cfg)
    assert int(out["overflow"]) == 0
    ref = rasterize_single(means, cov3d, colors, opa, cv, cvp, jnp.ones(3),
                           _cfg(hw=32))
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(ref["image"]), atol=1e-6)
    g = jax.grad(lambda m: jnp.sum(rasterize_single(
        m, cov3d, colors, opa, cv, cvp, jnp.ones(3), cfg)["image"] ** 2))(means)
    assert np.isfinite(np.asarray(g)).all()
    # the scatter regroup route pads the payload to the budget itself
    # (regression: shape-mismatch trace error when budget > candidates);
    # pin the global layout — per-view regions bypass regroup_mode
    g_scat = jax.grad(lambda m: jnp.sum(rasterize_single(
        m, cov3d, colors, opa, cv, cvp, jnp.ones(3),
        cfg._replace(regroup_mode="scatter",
                     per_view_budget=False))["image"] ** 2))(means)
    g_glob = jax.grad(lambda m: jnp.sum(rasterize_single(
        m, cov3d, colors, opa, cv, cvp, jnp.ones(3),
        cfg._replace(per_view_budget=False))["image"] ** 2))(means)
    np.testing.assert_allclose(np.asarray(g_scat), np.asarray(g_glob),
                               atol=1e-5, rtol=1e-5)


def test_cuda_truncation_mode_matches_rect_oracle():
    """exact_radius=False reproduces the reference CUDA preprocess's
    fixed 3-sigma tile-rect truncation exactly (the dense oracle's default
    tile_size=32 rect rule) — the strict-parity mode for judging against
    diff_gaussian_rasterization outputs."""
    means, cov3d, colors, opa, cv, cvp = _inputs(n=96)
    cfg = _cfg()._replace(exact_radius=False)
    out = rasterize_single(means, cov3d, colors, opa, cv, cvp,
                           jnp.ones(3), cfg)
    assert int(out["overflow"]) == 0
    for v in range(cv.shape[0]):
        ref = render_dense(means, cov3d, colors, opa, cv[v], cvp[v],
                           TH, TH, cfg.img_h, cfg.img_w, bg_color=jnp.ones(3),
                           tile_size=32)
        np.testing.assert_allclose(
            np.asarray(out["image"][v]), np.asarray(ref["image"]),
            atol=5e-5, rtol=1e-4,
        )


def test_regroup_scatter_matches_sort():
    """regroup_mode='scatter' (one permutation scatter) must produce the
    same gradients as the default sort-inversion route."""
    means, cov3d, colors, opa, cv, cvp = _inputs(n=64)
    g_img = jax.random.normal(jax.random.PRNGKey(2), (cv.shape[0], 3, 32, 32))

    def loss_for(cfg):
        def loss(m):
            out = rasterize_single(m, cov3d, colors, opa, cv, cvp,
                                   jnp.ones(3), cfg)
            return jnp.sum(out["image"] * g_img)
        return loss

    # pin the global layout: per-view regions bypass regroup_mode
    base = _cfg(hw=32)._replace(grad_stream_bf16=False,
                                per_view_budget=False)
    g_sort = jax.grad(loss_for(base))(means)
    g_scat = jax.grad(loss_for(base._replace(regroup_mode="scatter")))(means)
    np.testing.assert_allclose(np.asarray(g_scat), np.asarray(g_sort),
                               atol=1e-6, rtol=1e-6)


def test_regroup_scatter_with_per_view_regions_raises():
    """regroup_mode='scatter' combined with per-view regions (the V>1
    default) must fail loudly instead of silently running the segmented
    sort route twice in an A/B (advisor r4)."""
    means, cov3d, colors, opa, cv, cvp = _inputs(n=16)
    cfg = _cfg(hw=32)._replace(regroup_mode="scatter", per_view_budget=True)
    with pytest.raises(ValueError, match="global pair-stream layout"):
        rasterize_single(means, cov3d, colors, opa, cv, cvp,
                         jnp.ones(3), cfg)


def test_per_view_regions_match_global():
    """per_view_budget=True (fixed chunk-aligned per-view regions of the
    dense pair stream + segmented backward regroup — the V>1 default) must
    produce the same image AND gradients as the global-prefix layout when
    nothing clips. Exercises the backward kernel's region-last emit rule:
    at 96 gaussians the views' segments end chunk-unaligned."""
    means, cov3d, colors, opa, cv, cvp = _inputs(n=96)
    g_img = jax.random.normal(jax.random.PRNGKey(4), (cv.shape[0], 3, 64, 64))

    def loss_for(cfg):
        def loss(m, c, col, o):
            out = rasterize_single(m, c, col, o, cv, cvp, jnp.ones(3), cfg)
            return jnp.sum(out["image"] * g_img) + jnp.sum(out["alpha"])
        return loss

    base = _cfg()._replace(grad_stream_bf16=False)
    out_pv = rasterize_single(means, cov3d, colors, opa, cv, cvp,
                              jnp.ones(3), base._replace(per_view_budget=True))
    out_gl = rasterize_single(means, cov3d, colors, opa, cv, cvp,
                              jnp.ones(3),
                              base._replace(per_view_budget=False))
    assert int(out_pv["overflow"]) == 0
    assert int(out_gl["overflow"]) == 0
    np.testing.assert_allclose(np.asarray(out_pv["image"]),
                               np.asarray(out_gl["image"]), atol=1e-6)
    g_pv = jax.grad(loss_for(base._replace(per_view_budget=True)),
                    argnums=(0, 1, 2, 3))(means, cov3d, colors, opa)
    g_gl = jax.grad(loss_for(base._replace(per_view_budget=False)),
                    argnums=(0, 1, 2, 3))(means, cov3d, colors, opa)
    # region padding shifts chunk boundaries for views > 0, so the kernels'
    # per-chunk prefix sums associate differently -> f32 reassociation noise
    # (measured ~1.5e-4 relative); compare normalized like the dense tests
    for name, a, b in zip(["means3d", "cov3d", "colors", "opacity"],
                          g_pv, g_gl):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4,
                                   err_msg=f"grad mismatch: {name}")


@pytest.mark.parametrize("per_view", [False, True])
def test_compact_sort_matches_uncompacted(per_view):
    """compact_sort=True (pre-sort compaction of valid candidates into the
    budget buffer) must reproduce the uncompacted image AND gradients
    exactly in both stream layouts when the budget does not clip — the
    compacted stream holds the same candidates in the same sorted order,
    only the sort inputs shrink."""
    means, cov3d, colors, opa, cv, cvp = _inputs(n=96)
    g_img = jax.random.normal(jax.random.PRNGKey(7), (cv.shape[0], 3, 64, 64))

    def loss_for(cfg):
        def loss(m, c, col, o):
            out = rasterize_single(m, c, col, o, cv, cvp, jnp.ones(3), cfg)
            return jnp.sum(out["image"] * g_img) + jnp.sum(out["alpha"])
        return loss

    base = _cfg()._replace(grad_stream_bf16=False, per_view_budget=per_view)
    out_c = rasterize_single(means, cov3d, colors, opa, cv, cvp,
                             jnp.ones(3), base._replace(compact_sort=True))
    out_u = rasterize_single(means, cov3d, colors, opa, cv, cvp,
                             jnp.ones(3), base)
    assert int(out_c["overflow"]) == 0
    np.testing.assert_allclose(np.asarray(out_c["image"]),
                               np.asarray(out_u["image"]), atol=0.0)
    g_c = jax.grad(loss_for(base._replace(compact_sort=True)),
                   argnums=(0, 1, 2, 3))(means, cov3d, colors, opa)
    g_u = jax.grad(loss_for(base), argnums=(0, 1, 2, 3))(means, cov3d,
                                                         colors, opa)
    for name, a, b in zip(["means3d", "cov3d", "colors", "opacity"],
                          g_c, g_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.0,
                                   err_msg=f"grad mismatch: {name}")


def test_compact_sort_clip_counts_and_stays_finite():
    """When the budget DOES clip, compaction drops in emission order —
    overflow must count the drops and gradients stay finite."""
    means, cov3d, colors, opa, cv, cvp = _inputs(n=512)
    cfg = _cfg(hw=64, chunk=32)._replace(pair_budget_factor=1,
                                         compact_sort=True,
                                         per_view_budget=False)
    out = rasterize_single(means, cov3d, colors, opa, cv, cvp,
                           jnp.ones(3), cfg)
    assert int(out["overflow"]) > 0
    g = jax.grad(lambda m: jnp.sum(rasterize_single(
        m, cov3d, colors, opa, cv, cvp, jnp.ones(3), cfg)["image"] ** 2
    ))(means)
    assert np.isfinite(np.asarray(g)).all()


def test_per_view_clipping_counts_and_stays_finite():
    """A view whose pairs exceed its region must clip (counted in overflow)
    while gradients stay finite and unclipped views stay exact."""
    means, cov3d, colors, opa, cv, cvp = _inputs(n=512)
    cfg = _cfg(hw=64, chunk=32)._replace(pair_budget_factor=1,
                                         per_view_budget=True)
    out = rasterize_single(means, cov3d, colors, opa, cv, cvp,
                           jnp.ones(3), cfg)
    assert int(out["overflow"]) > 0
    g = jax.grad(lambda m: jnp.sum(rasterize_single(
        m, cov3d, colors, opa, cv, cvp, jnp.ones(3), cfg)["image"] ** 2
    ))(means)
    assert np.isfinite(np.asarray(g)).all()


def test_mean_pixel_not_dropped_by_power_rounding():
    """Regression (round-4 verify drive): the expanded-basis exponent matmul
    can round to power = +eps at a pixel sitting ON a gaussian's mean — the
    pixel where alpha is largest. The old CUDA-style `power > 0 -> drop`
    guard zeroed a 0.74-alpha contribution there (0.607 image error at
    n=160/seed=1/cam0); the clamp keeps it. Dense-oracle parity at the
    exact failing inputs."""
    g = random_gaussians(160, seed=1)
    cov3d = build_cov3d(jnp.asarray(g["scales"]), jnp.asarray(g["rotations"]))
    cv, cvp, _ = orbit_rig(3)
    means = jnp.asarray(g["means3d"])
    colors = jnp.asarray(g["colors"])
    opa = jnp.asarray(g["opacity"])
    cfg = _cfg()
    out = rasterize_single(means, cov3d, colors, opa, cv[0:1], cvp[0:1],
                           jnp.ones(3), cfg)
    ref = render_dense(means, cov3d, colors, opa, cv[0], cvp[0], TH, TH,
                       64, 64, bg_color=jnp.ones(3), tile_size=0)
    np.testing.assert_allclose(
        np.asarray(out["image"][0]), np.asarray(ref["image"]),
        atol=2e-4, rtol=1e-4,
    )
