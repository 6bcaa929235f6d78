#!/usr/bin/env python
"""Weak-scaling harness (BASELINE.md config 5).

Measures VAE train-step throughput per chip at mesh sizes 1..N with the
per-chip workload held constant (batch = mesh size), and reports scaling
efficiency. On a real pod slice run one process per host; on a dev box use
virtual devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/weak_scaling.py --sizes 1,2,4,8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default=None, help="write results JSON here")
    args = ap.parse_args()

    import jax
    import numpy as np

    from __graft_entry__ import _cams, _graft_cfg
    from sigman_release_tpu.parallel.mesh import make_mesh, shard_batch
    from sigman_release_tpu.training.vae_trainer import VAETrainer

    sizes = [int(s) for s in args.sizes.split(",")]
    base_cfg = _graft_cfg()
    rng = np.random.default_rng(0)
    cv, cvp = _cams(base_cfg)
    results = {}

    for n in sizes:
        if n > jax.device_count():
            print(f"skip {n}: only {jax.device_count()} devices")
            continue
        cfg = base_cfg.replace(batch_size=n)
        mesh = make_mesh((n,), ("data",),
                         devices=np.asarray(jax.devices()[:n]))
        trainer = VAETrainer(cfg, mesh=mesh)
        key = jax.random.PRNGKey(0)
        state, lpips_params = trainer.init_state(key)
        B, V, H = n, cfg.num_input_views, cfg.input_size
        batch = {
            "input": rng.normal(0, 1, (B, V, 9, H, H)).astype(np.float32),
            "UV_inital": rng.uniform(0, 1, (B, 3, H, H)).astype(np.float32),
            "smpl_params": rng.normal(0, 0.1, (B, 175)).astype(np.float32),
            "cam_view": np.tile(np.asarray(cv)[None], (B, 1, 1, 1)),
            "cam_view_proj": np.tile(np.asarray(cvp)[None], (B, 1, 1, 1)),
            "images_output": rng.uniform(
                0, 1, (B, cfg.num_views, 3, cfg.output_size, cfg.output_size)
            ).astype(np.float32),
            "masks_output": np.ones(
                (B, cfg.num_views, 1, cfg.output_size, cfg.output_size),
                np.float32,
            ),
        }
        sharded = shard_batch(batch, mesh)
        state, _ = trainer.train_step_g(state, sharded, lpips_params, key)
        jax.block_until_ready(state.params)
        t0 = time.time()
        for _ in range(args.steps):
            state, _ = trainer.train_step_g(state, sharded, lpips_params, key)
        jax.block_until_ready(state.params)
        dt = (time.time() - t0) / args.steps
        rays = B * cfg.num_views * cfg.output_size ** 2
        results[n] = {"sec_per_step": dt, "rays_per_s_per_chip": rays / dt / n}
        print(f"mesh={n}: {dt:.3f}s/step, "
              f"{results[n]['rays_per_s_per_chip']:.0f} rays/s/chip")

    if 1 in results:
        base = results[1]["rays_per_s_per_chip"]
        for nn, r in results.items():
            r["efficiency"] = r["rays_per_s_per_chip"] / base
    payload = {
        "backend": jax.devices()[0].platform,
        "device_count": jax.device_count(),
        "host_cores": os.cpu_count(),
        "note": ("virtual-device CPU run: efficiency numbers measure the "
                 "sharded-program + collective overhead shape, not chip "
                 "throughput (threads time-share cores past mesh > cores)"),
        "results": results,
    }
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
