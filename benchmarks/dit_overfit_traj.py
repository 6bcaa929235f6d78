#!/usr/bin/env python
"""DiT learning trajectory: v-loss falling on a fixed cached-latent dataset.

Companion to overfit_traj.py (VERDICT r5 #2): proves the DiT training path
(noise + v-target + SNR weights + cond dropout + AdamW, the reference's
train_DiT.py:316-413 loop) actually LEARNS — the per-step v-prediction loss
must fall substantially as the model memorizes a small fixed set of
(latent, cond) pairs where the latent is a deterministic function of the
conditioning. Every prior DiT artifact was a one-step timing.

The dataset: 64 fixed pairs; each latent is a smooth low-frequency pattern
determined by its conditioning vector, so there is structure to learn and
the v-loss floor of an amnesiac model (predicting noise-independent
statistics only) is well above the memorization floor.

    python benchmarks/dit_overfit_traj.py --steps 400 --out TRAJ_r05_dit.json
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
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_data", type=int, default=64)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="TRAJ_r05_dit.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from sigman_release_tpu.config import PRESETS
    from sigman_release_tpu.parallel.mesh import make_mesh
    from sigman_release_tpu.training.dit_trainer import DiTTrainer

    assert args.dim % 64 == 0
    cfg = PRESETS["dit"].replace(
        num_attention_heads=args.dim // 64, attention_head_dim=64,
        num_layers=args.layers, batch_size=args.batch, lr=args.lr,
        lr_scheduler="constant", lr_warmup_steps=0,
    )
    mesh = make_mesh((1,), ("data",))
    trainer = DiTTrainer(cfg, mesh=mesh)
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))

    # fixed dataset: latent = deterministic smooth function of cond
    rng = np.random.default_rng(0)
    D, C, Hs = args.n_data, cfg.in_channels, cfg.sample_height
    cond = rng.normal(0, 1, (D, cfg.text_embed_dim, 8, 8)).astype(np.float32)
    yy, xx = np.meshgrid(np.linspace(0, 1, Hs), np.linspace(0, 1, Hs),
                         indexing="ij")
    freqs = rng.normal(0, 1, (D, C, 4)).astype(np.float32)
    latents = (
        freqs[..., 0, None, None] * np.sin(2 * np.pi * xx)[None, None]
        + freqs[..., 1, None, None] * np.cos(2 * np.pi * yy)[None, None]
        + freqs[..., 2, None, None] * np.sin(4 * np.pi * (xx + yy))[None, None]
        + freqs[..., 3, None, None]
    ).astype(np.float32)
    latents = jnp.asarray(latents)
    cond = jnp.asarray(cond)

    B = args.batch
    traj = []
    t0 = time.time()
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        idx = np.asarray(
            rng.integers(0, D, B))
        batch = {"latent": latents[idx], "cond": cond[idx]}
        state, logs = trainer.train_step(state, batch, sub)
        traj.append(float(logs["loss"]))
        if i % 20 == 0:
            print(f"[{i}] loss {traj[-1]:.4f} "
                  f"({(time.time()-t0)/(i+1):.2f}s/step)", flush=True)

    first = float(np.mean(traj[:10]))
    last = float(np.mean(traj[-10:]))
    result = {
        "workload": f"dit d={args.dim} L={args.layers} B={B} "
                    f"fixed_dataset={D} cached latents",
        "platform": jax.devices()[0].platform,
        "n_params": int(n_params),
        "lr": args.lr,
        "steps": args.steps,
        "v_loss_first10_mean": round(first, 4),
        "v_loss_last10_mean": round(last, 4),
        "v_loss_reduction_factor": round(first / max(last, 1e-9), 2),
        "wall_s": round(time.time() - t0, 1),
        "trajectory": [round(x, 5) for x in traj],
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "trajectory"}))


if __name__ == "__main__":
    main()
