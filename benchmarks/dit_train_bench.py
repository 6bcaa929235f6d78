#!/usr/bin/env python
"""DiT TRAIN-step benchmark on one chip + the FSDP memory model.

The reference trains its 2048-d/30-layer DiT with bs=8/GPU
(/root/reference/train_DiT.py:316-570). The full ``dit`` preset (~1.9B
params) cannot fit a single 16 GB v5e with Adam — moments alone are ~15.5 GB
f32 — so this bench measures the LARGEST single-chip-trainable scale (CLI
--dim/--layers; default 1536 x 16) and prints the analytic FSDP memory model
for the full preset (bytes/chip vs mesh size -> predicted minimum slice).

Two rows per run:
* ``cached``  — DiT-only step on pre-encoded latents (the latent-caching
  input path; isolates transformer train throughput + gives the MFU figure),
* ``e2e``     — includes the frozen vae_b VAE encode of the 6 input views at
  512^2 + the conditioning encoder forward, like the reference's loop.

    python benchmarks/dit_train_bench.py --batch 8 --dim 1536 --layers 16
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tree_bytes(tree):
    import jax

    return sum(x.size * x.dtype.itemsize
               for x in jax.tree.leaves(tree) if hasattr(x, "size"))


def fsdp_model(n_params: int):
    """Analytic FSDP (ZeRO-3) bytes/chip for the full preset.

    Steady-state per chip: f32 master params (4 B) + two f32 Adam moments
    (8 B) + the f32 grad buffer XLA materializes between reduce-scatter and
    the optimizer (4 B), all sharded over the data axis; transient: ONE
    layer's bf16 all-gathered params (unsharded) plus remat'd activations.
    """
    rows = {}
    per_param = 4 + 8 + 4
    for n in (1, 2, 4, 8, 16):
        gb = n_params * per_param / n / 2**30
        rows[f"n={n}"] = round(gb, 2)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dim", type=int, default=1536)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--e2e", action="store_true",
                    help="also time the step with the frozen VAE/cond encode")
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
        num_attention_heads=args.dim // 64,
        attention_head_dim=64,
        num_layers=args.layers,
        batch_size=args.batch,
    )
    mesh = make_mesh((1,), ("data",))
    trainer = DiTTrainer(cfg, mesh=mesh)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state = trainer.init_state(key)
    jax.block_until_ready(state.params)
    init_s = time.time() - t0
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    state_gb = (tree_bytes(state.params) + tree_bytes(state.opt_state)) / 2**30

    B = args.batch
    rng = np.random.default_rng(0)
    batch = {
        "latent": jnp.asarray(rng.normal(
            0, 1, (B, cfg.in_channels, cfg.sample_height, cfg.sample_width)
        ).astype(np.float32)),
        "cond": jnp.asarray(rng.normal(
            0, 1, (B, cfg.text_embed_dim, 16, 16)).astype(np.float32)),
    }

    t0 = time.time()
    state, logs = trainer.train_step(state, batch, key)
    jax.block_until_ready(state.params)
    compile_s = time.time() - t0

    def timed(st):
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            for _ in range(args.steps):
                st, _ = trainer.train_step(st, batch, key)
            jax.block_until_ready(st.params)
            best = min(best, (time.time() - t0) / args.steps)
        return best, st

    step_s, state = timed(state)

    # analytic transformer FLOPs: 6 * n_params * tokens per fwd+bwd matmul
    # work (the standard estimate) + attention 12*L*d*T^2-ish (small at
    # T~1024+cond); MFU against v5e bf16 peak 197 TFLOP/s
    tokens = B * (cfg.num_patches
                  + (16 * 16))          # latent patches + cond tokens
    flops = 6 * n_params * tokens
    mfu = flops / step_s / 197e12

    out = {
        "workload": f"dit d={args.dim} L={args.layers} B={B} "
                    f"tokens/sample={tokens // B}",
        "platform": jax.devices()[0].platform,
        "n_params": n_params,
        "train_state_gb": round(state_gb, 2),
        "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "step_s_cached_latents": round(step_s, 4),
        "samples_per_s": round(B / step_s, 2),
        "mfu_vs_197tflops_bf16": round(mfu, 3),
        "fsdp_state_gb_per_chip_full_preset": fsdp_model(1_942_000_000),
    }

    if args.e2e:
        # full loop shape: frozen vae_b encode of 6x512^2 views + cond encode
        from sigman_release_tpu.models.encoders import ViTFeatureEncoder
        from sigman_release_tpu.models.vae import VAEModel

        vae_cfg = PRESETS["vae_b"]
        vae = VAEModel(vae_cfg)
        k1, k2 = jax.random.split(key)
        H = vae_cfg.input_size
        vae_params = jax.jit(vae.init)(
            {"params": k1, "sample": k2},
            jnp.zeros((1, vae_cfg.num_input_views, 9, H, H)),
            jnp.zeros((1, 3, H, H)), k2,
        )
        enc = ViTFeatureEncoder(embed_dim=cfg.text_embed_dim)
        enc_params = enc.init(k1, jnp.zeros((1, 3, 1024, 1024)))
        trainer2 = DiTTrainer(cfg, vae_params=vae_params,
                              encoder_params=enc_params, mesh=mesh)
        e2e_batch = {
            "input": jnp.asarray(rng.normal(
                0, 1, (B, vae_cfg.num_input_views, 9, H, H)
            ).astype(np.float32)),
            "UV_inital": jnp.asarray(rng.uniform(
                0, 1, (B, 3, H, H)).astype(np.float32)),
            "sapiens_input": jnp.asarray(rng.uniform(
                0, 1, (B, 3, 1024, 1024)).astype(np.float32)),
        }
        t0 = time.time()
        state, _ = trainer2.train_step(state, e2e_batch, key)
        jax.block_until_ready(state.params)
        out["compile_e2e_s"] = round(time.time() - t0, 1)
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            for _ in range(max(2, args.steps // 2)):
                state, _ = trainer2.train_step(state, e2e_batch, key)
            jax.block_until_ready(state.params)
            best = min(best, (time.time() - t0) / max(2, args.steps // 2))
        out["step_s_with_frozen_encodes"] = round(best, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
