#!/usr/bin/env python
"""Stage breakdown of the rasterizer on the real chip.

Times nested subsets (proj; proj+bin; +kernel fwd; full fwd+bwd) so each
increment is a *fused-program* delta — PERF.md: only end-to-end numbers are
trustworthy; stage-isolated jits overstate what XLA fuses away.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from utils import orbit_rig, random_gaussians, tan_half_fov

    from sigman_release_tpu.ops.rasterizer import (
        RasterizeConfig, build_cov3d, rasterize_single,
    )
    from sigman_release_tpu.ops.rasterizer import binning as binning_lib
    from sigman_release_tpu.ops.rasterizer.preprocess import project_gaussians

    on_cpu = jax.devices()[0].platform == "cpu"
    n_gauss = 50_000 if not on_cpu else 2_000
    hw = 512 if not on_cpu else 128
    V = int(os.environ.get("PROF_VIEWS", "1"))

    th = tan_half_fov()
    g = random_gaussians(n_gauss, seed=0, spread=0.4,
                         scale_lo=0.004, scale_hi=0.02)
    cov3d = build_cov3d(jnp.asarray(g["scales"]), jnp.asarray(g["rotations"]))
    cam_view, cam_view_proj, _ = orbit_rig(V)
    cfg = RasterizeConfig(img_h=hw, img_w=hw, tan_half_fovx=th,
                          tan_half_fovy=th, chunk=128, interpret=on_cpu,
                          pair_budget_factor=5)
    means = jnp.asarray(g["means3d"])
    colors = jnp.asarray(g["colors"])
    opa = jnp.asarray(g["opacity"])

    def t(fn, *args, iters=10):
        r = jax.block_until_ready(fn(*args))
        t0 = time.time()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.time() - t0) / iters * 1e3  # ms

    @jax.jit
    def proj_only(m, c):
        return jax.vmap(lambda cv, cvp: project_gaussians(
            m, c, cv, cvp, cfg.tan_half_fovx, cfg.tan_half_fovy,
            cfg.img_h, cfg.img_w))(cam_view, cam_view_proj)

    @jax.jit
    def proj_bin(m, c, col, o):
        p = proj_only(m, c)
        return binning_lib.bin_gaussians(
            p, col, o, cfg.img_h, cfg.img_w,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            chunk=cfg.chunk,
            pair_budget=cfg.pair_budget_factor * n_gauss * V,
            per_view_budget=V > 1)

    @jax.jit
    def full_fwd(m, c, col, o):
        out = rasterize_single(m, c, col, o, cam_view, cam_view_proj,
                               jnp.ones(3), cfg)
        return out["image"], out["alpha"]

    def loss(m, c, col, o):
        img, alpha = full_fwd(m, c, col, o)
        return jnp.sum(img ** 2) + jnp.sum(alpha)

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

    bins = proj_bin(means, cov3d, colors, opa)
    pairs = int(jnp.sum(bins.tile_count))
    print(f"workload: N={n_gauss} V={V} hw={hw} real_pairs={pairs} "
          f"overflow={int(jnp.sum(bins.overflow))}", flush=True)

    t_proj = t(proj_only, means, cov3d)
    t_bin = t(proj_bin, means, cov3d, colors, opa)
    t_fwd = t(full_fwd, means, cov3d, colors, opa)
    t_fb = t(grad_fn, means, cov3d, colors, opa)
    rays = hw * hw * V
    out = {
        "V": V, "pairs": pairs,
        "proj_ms": round(t_proj, 2),
        "proj_bin_ms": round(t_bin, 2),
        "fwd_ms": round(t_fwd, 2),
        "fwd_bwd_ms": round(t_fb, 2),
        "bin_delta_ms": round(t_bin - t_proj, 2),
        "kernel_fwd_delta_ms": round(t_fwd - t_bin, 2),
        "bwd_delta_ms": round(t_fb - t_fwd, 2),
        "Mrays_s_fwd": round(rays / t_fwd / 1e3, 2),
        "Mrays_s_fwd_bwd": round(rays / t_fb / 1e3, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
