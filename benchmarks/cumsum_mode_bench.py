#!/usr/bin/env python
"""A/B the kernels' prefix-sum MXU pass count (RasterizeConfig.cumsum_mode).

The triangular cumsum matmuls are ~2/3 of per-chunk kernel FLOPs; Mosaic runs
f32 dots as multi-pass bf16 on the MXU, so "bf16x2" (hi+lo split) saves one
pass and "bf16" two. This times the full fwd+bwd headline workload per mode,
min-of-several (tunnel noise protocol, PERF.md), and reports each mode's
image/grad deltas vs f32 so the speed/precision tradeoff is visible in one
run (bf16 carries ~2^-9 relative rounding in the transmittance scan).
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

    # pair-overflow honesty guard (same rule as bench.py): the timed
    # configuration must render essentially all pairs. Binning is
    # cumsum_mode-independent, so one check covers every mode.
    base_cfg = RasterizeConfig(
        img_h=hw, img_w=hw, tan_half_fovx=th, tan_half_fovy=th,
        chunk=128, interpret=on_cpu, pair_budget_factor=5,
    )
    probe = jax.jit(lambda: rasterize_single(
        means, cov3d, colors, opa, cam_view, cam_view_proj,
        jnp.ones(3), base_cfg)["overflow"])()
    overflow = int(jnp.sum(probe))
    print(f"overflow: {overflow} dropped pairs", flush=True)
    assert overflow < n_gauss * v * 0.01, (
        f"pair overflow {overflow}: raise the budget/window"
    )

    results = {}
    ref_img = ref_grad = None
    modes = tuple(os.environ.get("CUMSUM_MODES",
                                 "f32,scan,bf16x2,bf16").split(","))
    for mode in modes:
        cfg = base_cfg._replace(cumsum_mode=mode)

        def render(m, c, col, o):
            return rasterize_single(m, c, col, o, cam_view, cam_view_proj,
                                    jnp.ones(3), cfg)

        def loss(m, c, col, o):
            out = render(m, c, col, o)
            return jnp.sum(out["image"] ** 2) + jnp.sum(out["alpha"])

        grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
        gr = grad_fn(means, cov3d, colors, opa)
        jax.block_until_ready(gr)

        # accuracy vs the f32 reference (image + mean-gradient deltas)
        img = jax.jit(render)(means, cov3d, colors, opa)["image"]
        if mode == "f32":
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
        results[mode] = {
            "ms": best * 1e3,
            "mrays_per_s": hw * hw * v / best / 1e6,
            **acc,
        }
        print(mode, results[mode], flush=True)

    print(json.dumps({"views": v, "results": results}))


if __name__ == "__main__":
    main()
