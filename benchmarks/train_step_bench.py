#!/usr/bin/env python
"""BASELINE config 4: full vae_b-scale VAE train step on the real chip.

512^2 input, 10 supervised views (6 input), LPIPS on, gradients through the
Pallas rasterizer, G and D steps — the reference's per-GPU training workload
(/root/reference/train_vae.py:126-348, vae_b preset). Gaussian count comes
from a synthetic template at avatar scale (the real subdivided SMPL-X
template is O(1e5) faces; pick --verts to match).

    python benchmarks/train_step_bench.py --batch 2 --views 10
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--views", type=int, default=10)
    ap.add_argument("--input_views", type=int, default=6)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--verts", type=int, default=26000,
                    help="synthetic body verts (~2x faces = gaussians)")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--trace", default=None, help="xprof trace dir")
    ap.add_argument("--trajectory", type=int, default=0,
                    help="run N real G steps and log overflow per step")
    # renderer pair capacity: the synthetic template's KNN distances are
    # larger than a real subdivided SMPL-X's, so untrained splats span more
    # tiles; widen these until the reported overflow is a small fraction of
    # N*V (the trainers log the same counter every step)
    ap.add_argument("--pair_budget_factor", type=int, default=None)
    ap.add_argument("--big_win", type=int, default=None)
    ap.add_argument("--max_tiles", type=int, default=None)
    ap.add_argument("--remat", choices=["block", "conv", "conv_enc", "none"],
                    default=None, help="VAE conv-stack remat policy A/B")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from sigman_release_tpu.body.smplx import synthetic_body_model
    from sigman_release_tpu.body.template import synthetic_template
    from sigman_release_tpu.config import PRESETS
    from sigman_release_tpu.geometry.cameras import (
        camera_bundle, orbit_camera, projection_matrix,
    )
    from sigman_release_tpu.parallel.mesh import make_mesh, shard_batch
    from sigman_release_tpu.training.vae_trainer import VAETrainer

    cfg = PRESETS["vae_b"].replace(
        input_size=args.size, output_size=args.size,
        num_views=args.views, num_input_views=args.input_views,
        batch_size=args.batch, lambda_lpips=1.0, disc_start=0,
    )
    for name, field in (("pair_budget_factor", "pair_budget_factor"),
                        ("big_win", "render_big_win"),
                        ("max_tiles", "max_tiles_per_gaussian")):
        val = getattr(args, name)
        if val is not None:
            assert val > 0, f"--{name} must be positive, got {val}"
            cfg = cfg.replace(**{field: val})
    if args.remat is not None:
        cfg = cfg.replace(remat_policy=args.remat)
    body = synthetic_body_model(n_verts=args.verts)
    template = synthetic_template(body)
    n_gauss = template.init_pcd.shape[0]
    mesh = make_mesh((1,), ("data",))
    trainer = VAETrainer(cfg, body_model=body, template=template, mesh=mesh)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, lpips_params = trainer.init_state(key)
    jax.block_until_ready(state.params)
    init_s = time.time() - t0

    B, V, H = args.batch, cfg.num_input_views, cfg.input_size
    rng = np.random.default_rng(0)
    proj = projection_matrix(cfg.znear, cfg.zfar, cfg.fovx, cfg.fovy)
    c2ws = np.stack([
        orbit_camera(10.0, 360.0 * v / cfg.num_views, cfg.cam_radius)
        for v in range(cfg.num_views)
    ])
    cv, cvp, _ = camera_bundle(c2ws, proj)
    batch = {
        "input": rng.normal(0, 1, (B, V, 9, H, H)).astype(np.float32),
        "UV_inital": rng.uniform(0, 1, (B, 3, H, H)).astype(np.float32),
        "smpl_params": rng.normal(0, 0.1, (B, 175)).astype(np.float32),
        "cam_view": np.tile(np.asarray(cv)[None], (B, 1, 1, 1)),
        "cam_view_proj": np.tile(np.asarray(cvp)[None], (B, 1, 1, 1)),
        "images_output": rng.uniform(
            0, 1, (B, cfg.num_views, 3, args.size, args.size)
        ).astype(np.float32),
        "masks_output": np.ones(
            (B, cfg.num_views, 1, args.size, args.size), np.float32),
    }
    sharded = shard_batch(batch, mesh)

    # analytic FLOPs of the lowered G step from XLA's own cost model —
    # feeds the MFU figure (vs v5e bf16 peak 197 TFLOP/s). AOT-lowered on
    # the same args; donation/shardings identical to the timed call.
    g_flops = None
    try:
        lowered = trainer._train_step_g_jit.lower(
            trainer, state, sharded, lpips_params, key,
            trainer.deformer_state)
        g_flops = lowered.compile().cost_analysis()["flops"]
    except Exception as e:  # cost model availability varies by backend
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    t0 = time.time()
    state, logs = trainer.train_step_g(state, sharded, lpips_params, key)
    jax.block_until_ready(state.params)
    compile_g = time.time() - t0
    t0 = time.time()
    state, _ = trainer.train_step_d(state, sharded, key)
    jax.block_until_ready(state.disc_params)
    compile_d = time.time() - t0

    def timed(fn, st, *a):
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            for _ in range(args.steps):
                st, _logs = fn(st, *a)        # states are DONATED: rebind
            jax.block_until_ready(st.params)
            best = min(best, (time.time() - t0) / args.steps)
        return best, st

    if args.trace:
        with jax.profiler.trace(args.trace):
            state, _ = trainer.train_step_g(state, sharded, lpips_params,
                                            key)
            jax.block_until_ready(state.params)

    g_s, state = timed(trainer.train_step_g, state, sharded, lpips_params,
                       key)
    d_s, state = timed(trainer.train_step_d, state, sharded, key)

    # --trajectory N: run N REAL G steps (params actually update) and log
    # the per-step overflow — measures whether pair-capacity pressure
    # relaxes as the huge untrained splats shrink (VERDICT r3 item 4)
    traj = []
    if args.trajectory:
        for i in range(args.trajectory):
            state, lg = trainer.train_step_g(state, sharded, lpips_params,
                                             jax.random.fold_in(key, i))
            traj.append(float(lg["overflow"]))

    rays = args.batch * cfg.num_views * args.size * args.size
    out = {
        "workload": f"vae_b B={args.batch} V={cfg.num_views} "
                    f"{args.size}^2 N={n_gauss} lpips=on "
                    f"remat={cfg.remat_policy}",
        "platform": jax.devices()[0].platform,
        "init_s": round(init_s, 1),
        "compile_g_s": round(compile_g, 1),
        "compile_d_s": round(compile_d, 1),
        "g_step_s": round(g_s, 4),
        "d_step_s": round(d_s, 4),
        "rays_per_s_g_step": round(rays / g_s),
        "overflow": float(logs["overflow"]),
    }
    if traj:
        out["overflow_trajectory"] = traj
    if g_flops:
        out["g_flops"] = g_flops
        # v5e peak: 197 TFLOP/s bf16, 98.5 f32. The G step is mixed
        # precision (f32 convs / bf16 attention+sampling); report against
        # the bf16 peak — the lower bound on utilization.
        out["g_mfu_vs_197tflops_bf16"] = round(g_flops / g_s / 197e12, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
