#!/usr/bin/env python
"""A/B the rasterizer tile size (RasterizeConfig.tile: 32 vs 16).

Smaller tiles quarter the per-chunk [K, tile^2] kernel work (the VPU ops and
the triangular cumsum matmuls all scale with tile^2) and saturate-stop at
finer granularity, but emit more (gaussian, tile) pairs (more chunks, bigger
sort/regroup streams). This times the full fwd+bwd headline workload per tile
size, min-of-several (tunnel noise protocol, PERF.md), with the pair count,
overflow guard, and image/grad deltas so speed and correctness land in one
run.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
from utils import orbit_rig, random_gaussians, tan_half_fov

from sigman_release_tpu.ops.rasterizer import (
    RasterizeConfig, build_cov3d, rasterize_single,
)

# (tile, max_tiles_per_gaussian, big_win, pair_budget_factor): the 16px
# windows cover a similar PIXEL footprint as the 32px ones (5x5 of 16px ~
# 3x3 of 32px) and the budget grows with the expected pair inflation. The
# binning SORT cost scales with EMITTED candidate slots (invalid keys ride
# the sort too), so the 4x4-base variant trades window coverage for a
# smaller sort stream.
CONFIGS = {
    "t32_w3": dict(tile=32, max_tiles_per_gaussian=9, big_win=6,
                   pair_budget_factor=5),
    # 4x4 base overflows at the headline cloud (measured 11k drops — the
    # exact-radius spans need 5x5); see PERF.md round-3b for the verdict:
    # 16px tiles lose here (2.1x pairs, 2.9x sort stream)
    "t16_w5": dict(tile=16, max_tiles_per_gaussian=25, big_win=12,
                   pair_budget_factor=8),
}


def main():
    on_cpu = jax.devices()[0].platform == "cpu"
    n_gauss = 50_000 if not on_cpu else 2_000
    hw = 512 if not on_cpu else 128
    v = int(os.environ.get("BENCH_VIEWS", "1"))

    th = tan_half_fov()
    g = random_gaussians(n_gauss, seed=0, spread=0.4,
                         scale_lo=0.004, scale_hi=0.02)
    cov3d = build_cov3d(jnp.asarray(g["scales"]), jnp.asarray(g["rotations"]))
    cam_view, cam_view_proj, _ = orbit_rig(v)
    means = jnp.asarray(g["means3d"])
    colors = jnp.asarray(g["colors"])
    opa = jnp.asarray(g["opacity"])

    results = {}
    ref_img = ref_grad = None
    for name, kw in CONFIGS.items():
        cfg = RasterizeConfig(
            img_h=hw, img_w=hw, tan_half_fovx=th, tan_half_fovy=th,
            chunk=128, interpret=on_cpu, **kw,
        )

        def render(m, c, col, o):
            return rasterize_single(m, c, col, o, cam_view, cam_view_proj,
                                    jnp.ones(3), cfg)

        def loss(m, c, col, o):
            out = render(m, c, col, o)
            return jnp.sum(out["image"] ** 2) + jnp.sum(out["alpha"])

        out0 = jax.jit(render)(means, cov3d, colors, opa)
        overflow = int(out0["overflow"])
        assert overflow < n_gauss * v * 0.01, (
            f"{name}: pair overflow {overflow} — widen windows/budget"
        )

        grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
        gr = grad_fn(means, cov3d, colors, opa)
        jax.block_until_ready(gr)

        img = out0["image"]
        if ref_img is None:
            ref_img, ref_grad = img, gr
            acc = {"max_abs_image_delta": 0.0, "rel_dmean_delta": 0.0}
        else:
            gscale = float(jnp.max(jnp.abs(ref_grad[0])))
            acc = {
                "max_abs_image_delta": float(jnp.max(jnp.abs(img - ref_img))),
                "rel_dmean_delta": float(
                    jnp.max(jnp.abs(gr[0] - ref_grad[0]))) / max(gscale, 1e-12),
            }

        reps, iters = (5, 5) if not on_cpu else (1, 1)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                gr = grad_fn(means, cov3d, colors, opa)
            jax.block_until_ready(gr)
            best = min(best, (time.perf_counter() - t0) / iters)
        results[name] = {
            "ms": round(best * 1e3, 3),
            "mrays_per_s": round(hw * hw * v / best / 1e6, 2),
            "overflow": overflow,
            **acc,
        }
        print(name, results[name], flush=True)

    print(json.dumps({"views": v, "results": results}))


if __name__ == "__main__":
    main()
