#!/usr/bin/env python
"""xprof op-level device-time breakdown of the rasterizer fwd+bwd.

Traces a chained multi-iteration dispatch (same protocol as bench.py) and
prints the top device ops by self time from the xprof framework_op_stats
table — the only timing source that is reliable on this host (PERF.md
measurement hygiene).

    PROF_VIEWS=10 python benchmarks/trace_ops.py
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def op_stats_from_trace(logdir):
    """[(total_self_us, occurrences, op_name)] device rows, sorted desc.

    framework_op_stats returns GViz DataTables: [{cols: [{id,...}],
    rows: [{c: [{v}, ...]}]}, ...]; table 0 is the by-operation view.
    """
    from xprof.convert import raw_to_tool_data as rttd

    runs = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*")))
    xspaces = glob.glob(os.path.join(runs[-1], "*.xplane.pb"))
    data, _ = rttd.xspace_to_tool_data(xspaces, "framework_op_stats", {})
    tables = json.loads(data) if isinstance(data, (str, bytes)) else data
    t = tables[0]
    ix = {c["id"]: i for i, c in enumerate(t["cols"])}
    out = []
    for r in t["rows"]:
        v = [c.get("v") for c in r["c"]]
        if v[ix["host_or_device"]] != "Device":
            continue
        out.append((float(v[ix["total_self_time"]]),
                    v[ix["occurrences"]], v[ix["operation"]]))
    out.sort(reverse=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from utils import orbit_rig, random_gaussians, tan_half_fov

    from sigman_release_tpu.ops.rasterizer import (
        RasterizeConfig, build_cov3d, rasterize_single,
    )

    V = int(os.environ.get("PROF_VIEWS", "10"))
    iters = int(os.environ.get("PROF_ITERS", "10"))
    n_gauss = 50_000
    hw = 512
    th = tan_half_fov()
    g = random_gaussians(n_gauss, seed=0, spread=0.4,
                         scale_lo=0.004, scale_hi=0.02)
    cov3d = build_cov3d(jnp.asarray(g["scales"]), jnp.asarray(g["rotations"]))
    cam_view, cam_view_proj, _ = orbit_rig(V)
    cfg = RasterizeConfig(img_h=hw, img_w=hw, tan_half_fovx=th,
                          tan_half_fovy=th, chunk=128)
    pvb = os.environ.get("PROF_PER_VIEW")
    if pvb is not None:
        cfg = cfg._replace(per_view_budget=pvb == "1")
    if os.environ.get("PROF_COMPACT") == "1":
        cfg = cfg._replace(compact_sort=True)
    pbf = os.environ.get("PROF_BUDGET")
    if pbf is not None:
        cfg = cfg._replace(pair_budget_factor=int(pbf))
    means = jnp.asarray(g["means3d"])
    colors = jnp.asarray(g["colors"])
    opa = jnp.asarray(g["opacity"])

    def loss(m, c, col, o):
        out = rasterize_single(m, c, col, o, cam_view, cam_view_proj,
                               jnp.ones(3), cfg)
        return jnp.sum(out["image"] ** 2) + jnp.sum(out["alpha"])

    grad_fn = jax.grad(loss, argnums=(0, 1, 2, 3))

    @jax.jit
    def chain(m, c, col, o):
        def body(_, params):
            gr = grad_fn(*params)
            return jax.tree.map(lambda p, gg: p - 1e-30 * gg, params, gr)
        return jax.lax.fori_loop(0, iters, body, (m, c, col, o))

    out = chain(means, cov3d, colors, opa)
    jax.block_until_ready(out)

    logdir = os.environ.get("PROF_DIR", "/tmp/raster_trace")
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        out = chain(means, cov3d, colors, opa)
        jax.block_until_ready(out)

    rows = op_stats_from_trace(logdir)
    tot = sum(r[0] for r in rows)
    print(f"V={V} iters={iters} device self-time total "
          f"{tot / 1e3 / iters:.2f} ms/iter")
    for s, n, op in rows[:25]:
        print(f"{s / 1e3 / iters:8.3f} ms/iter  x{n}  {str(op)[:90]}")


if __name__ == "__main__":
    main()
