#!/usr/bin/env python
"""Headline benchmark: rendered rays/s/chip, forward+backward at 512^2.

Measures the BASELINE.json north-star workload — a ~50k-Gaussian avatar-scale
cloud rasterized at 512x512 with gradient backprop through the Pallas
renderer — and prints ONE JSON line.

``vs_baseline`` is the ratio against NOMINAL_BASELINE_RAYS_S, a fixed
reference constant representing the CUDA ``diff-gaussian-rasterization``
fwd+bwd throughput class on a contemporary GPU (~1e8 rays/s at this workload;
the reference repo publishes no numbers — BASELINE.md). Keeping the constant
fixed makes the ratio comparable across rounds.
"""

import json
import sys
import time

NOMINAL_BASELINE_RAYS_S = 1.0e8


def main():
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent compilation cache: Mosaic/remote compiles of the fwd+bwd
    # program take minutes; repeat runs (and the driver's) hit the cache
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    sys.path.insert(0, "tests")
    from utils import orbit_rig, random_gaussians, tan_half_fov

    from sigman_release_tpu.ops.rasterizer import (
        RasterizeConfig,
        build_cov3d,
        rasterize_single,
    )

    on_cpu = jax.devices()[0].platform == "cpu"
    # BENCH_N overrides the cloud size (e.g. 100000 = real subdivided
    # SMPL-X template scale — the committed headline stays 50k)
    n_gauss = int(os.environ.get("BENCH_N",
                                 "50000" if not on_cpu else "2000"))
    hw = 512 if not on_cpu else 128
    # headline workload is V=1 (round-comparable); BENCH_VIEWS=10 measures
    # the vae_b render workload (10 views / same gaussians) instead — the
    # multi-view number also ships in BENCH_r03_v10.json
    views = int(os.environ.get("BENCH_VIEWS", "1"))
    # BENCH_FWD=1: forward-only (the test_vae / test_DiT serving path —
    # /root/reference/scripts/test_vae.py:35-116 renders without grads);
    # prints metric rendered_rays_per_s_fwd_512 instead
    fwd_only = os.environ.get("BENCH_FWD", "0") == "1"
    # BENCH_COMPACT=1: pre-sort compaction of valid candidates (A/B of the
    # compact_sort lever — see RasterizeConfig.compact_sort)
    compact = os.environ.get("BENCH_COMPACT", "0") == "1"

    th = tan_half_fov()
    g = random_gaussians(n_gauss, seed=0, spread=0.4,
                         scale_lo=0.004, scale_hi=0.02)
    cov3d = build_cov3d(jnp.asarray(g["scales"]), jnp.asarray(g["rotations"]))
    cam_view, cam_view_proj, _ = orbit_rig(views)
    cfg = RasterizeConfig(
        img_h=hw, img_w=hw, tan_half_fovx=th, tan_half_fovy=th,
        chunk=128, interpret=on_cpu,
        # 3x3 base window + top-K 6x6 fallback (binning v5 dual window;
        # the assert below enforces <1% dropped pairs); the tighter pair
        # budget shrinks all P_alloc-proportional placement work
        pair_budget_factor=5,
        compact_sort=compact,
    )
    means = jnp.asarray(g["means3d"])
    colors = jnp.asarray(g["colors"])
    opa = jnp.asarray(g["opacity"])

    def render(m, c, col, o):
        return rasterize_single(m, c, col, o, cam_view, cam_view_proj,
                                jnp.ones(3), cfg)

    def loss(m, c, col, o):
        out = render(m, c, col, o)
        return jnp.sum(out["image"] ** 2) + jnp.sum(out["alpha"])

    # honesty guard, computed from the binning stage alone (no kernel
    # compile): the timed configuration must render essentially all pairs —
    # a handful of near-camera outliers may exceed the 6x6 window
    from sigman_release_tpu.ops.rasterizer import binning as binning_lib
    from sigman_release_tpu.ops.rasterizer.preprocess import project_gaussians

    @jax.jit
    def count_overflow(m, c, col, o):
        p = jax.vmap(lambda cv, cvp: project_gaussians(
            m, c, cv, cvp, cfg.tan_half_fovx, cfg.tan_half_fovy,
            cfg.img_h, cfg.img_w))(cam_view, cam_view_proj)
        bins = binning_lib.bin_gaussians(
            p, col, o, cfg.img_h, cfg.img_w,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            chunk=cfg.chunk,
            pair_budget=cfg.pair_budget_factor * n_gauss * views,
            per_view_budget=views > 1,  # match rasterize_single's auto mode
        )
        return bins.overflow

    overflow = int(count_overflow(means, cov3d, colors, opa))
    assert overflow < n_gauss * views * 0.01, (
        f"pair overflow {overflow}: raise the budget/window"
    )

    # 50 chained iterations: the tunnel charges a fixed ~26-30 ms round
    # trip PER DISPATCH (measured flat across 1/10/50-iteration chains —
    # PERF.md round-3b); a longer chain amortizes it so the rate converges
    # to true device throughput
    iters = 50 if not on_cpu else 2

    # Throughput protocol: the iterations are CHAINED inside one jitted
    # lax.fori_loop as genuine SGD steps (lr so small every f32 update
    # rounds to the unchanged value), so each iteration is a full fwd+bwd
    # with a real data dependence on the previous one — XLA cannot hoist or
    # parallelize them — and the measurement is steady-state device
    # throughput, the way the op actually runs inside a jitted train step.
    # Timing N separate dispatches instead adds a ~2.3 ms/call host-tunnel
    # dispatch gap (PERF.md) that exists in neither a local-host deployment
    # nor a fused training program.
    grad_fn = jax.grad(loss, argnums=(0, 1, 2, 3))

    if fwd_only:
        # forward chain: feed a loss-scaled no-op update through the means
        # so iterations stay data-dependent without a backward pass
        @jax.jit
        def sgd_chain(m, c, col, o):
            def body(_, params):
                m_, c_, col_, o_ = params
                val = loss(m_, c_, col_, o_)
                return (m_ + 1e-30 * val, c_, col_, o_)
            return jax.lax.fori_loop(0, iters, body, (m, c, col, o))
    else:
        @jax.jit
        def sgd_chain(m, c, col, o):
            def body(_, params):
                g = grad_fn(*params)
                return jax.tree.map(lambda p, gg: p - 1e-30 * gg, params, g)
            return jax.lax.fori_loop(0, iters, body, (m, c, col, o))

    out0 = sgd_chain(means, cov3d, colors, opa)
    jax.block_until_ready(out0)

    best = float("inf")
    for _ in range(3 if not on_cpu else 1):
        t0 = time.perf_counter()
        out0 = sgd_chain(means, cov3d, colors, opa)
        jax.block_until_ready(out0)
        best = min(best, time.perf_counter() - t0)
    dt = best / iters

    rays_per_s = hw * hw * views / dt
    out = {
        "metric": ("rendered_rays_per_s_fwd_512" if fwd_only
                   else "rendered_rays_per_s_fwd_bwd_512"),
        "value": rays_per_s,
        "unit": "rays/s/chip",
        "vs_baseline": rays_per_s / NOMINAL_BASELINE_RAYS_S,
    }
    if views != 1:
        out["views"] = views
    if "BENCH_N" in os.environ:
        out["n_gauss"] = n_gauss
    if compact:
        out["compact_sort"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
