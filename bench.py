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
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "tests")
    from utils import orbit_rig, random_gaussians, tan_half_fov

    from sigman_release_tpu.ops.rasterizer import (
        RasterizeConfig,
        build_cov3d,
        rasterize_single,
    )

    on_cpu = jax.devices()[0].platform == "cpu"
    n_gauss = 50_000 if not on_cpu else 2_000
    hw = 512 if not on_cpu else 128

    th = tan_half_fov()
    g = random_gaussians(n_gauss, seed=0, spread=0.4,
                         scale_lo=0.004, scale_hi=0.02)
    cov3d = build_cov3d(jnp.asarray(g["scales"]), jnp.asarray(g["rotations"]))
    cam_view, cam_view_proj, _ = orbit_rig(1)
    cfg = RasterizeConfig(
        img_h=hw, img_w=hw, tan_half_fovx=th, tan_half_fovy=th,
        chunk=128, interpret=on_cpu,
        # avatar-scale gaussians span <=4 tiles per axis; the smaller window
        # halves every candidate-sized binning op, and a tighter pair budget
        # shrinks all P_alloc-proportional placement work (PERF.md items 1/5)
        max_tiles_per_gaussian=16,
        pair_budget_factor=5,
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

    # honesty guard: the timed configuration must not drop pairs
    overflow = int(jax.jit(
        lambda *a: render(*a)["overflow"]
    )(means, cov3d, colors, opa))
    assert overflow == 0, f"pair overflow {overflow}: raise the budget/window"

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    gr = grad_fn(means, cov3d, colors, opa)
    jax.block_until_ready(gr)

    iters = 10 if not on_cpu else 2
    t0 = time.time()
    for _ in range(iters):
        gr = grad_fn(means, cov3d, colors, opa)
    jax.block_until_ready(gr)
    dt = (time.time() - t0) / iters

    rays_per_s = hw * hw / dt
    print(json.dumps({
        "metric": "rendered_rays_per_s_fwd_bwd_512",
        "value": rays_per_s,
        "unit": "rays/s/chip",
        "vs_baseline": rays_per_s / NOMINAL_BASELINE_RAYS_S,
    }))


if __name__ == "__main__":
    main()
