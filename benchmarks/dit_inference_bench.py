#!/usr/bin/env python
"""BASELINE config 3: image-conditioned DiT sampling throughput.

Times the full jitted CFG DDIM loop (30 steps, guidance 3.5 — the
reference's inference configuration, DDPM_sample_pipeline.py:332,475) at the
dit preset (~1.7B params, bf16) plus the frozen-VAE decode path.

    python benchmarks/dit_inference_bench.py --steps_timing 3
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
    ap.add_argument("--preset", default="dit")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--num_inference_steps", type=int, default=30)
    ap.add_argument("--steps_timing", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from sigman_release_tpu.config import PRESETS
    from sigman_release_tpu.models.encoders import ViTFeatureEncoder
    from sigman_release_tpu.parallel.mesh import make_mesh
    from sigman_release_tpu.training.dit_trainer import DiTTrainer

    cfg = PRESETS[args.preset].replace(
        num_inference_steps=args.num_inference_steps
    )
    mesh = make_mesh((1,), ("data",))
    encoder = ViTFeatureEncoder(embed_dim=cfg.text_embed_dim)
    enc_params = encoder.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 3, 256, 256)))
    trainer = DiTTrainer(cfg, encoder_params=enc_params, mesh=mesh)
    trainer.encoder = encoder

    t0 = time.time()
    # params ONLY — no optimizer state (Adam moments at the 1.7B preset are
    # 13.6GB and don't fit one 16GB chip next to the params; inference
    # doesn't need them). Init + bf16 cast inside one jit so the f32 tree
    # never persists (the reference samples in bf16 too).
    from sigman_release_tpu.training.dit_trainer import DiTTrainState

    def init_bf16(key):
        latent = jnp.zeros((1, cfg.in_channels, cfg.sample_height,
                            cfg.sample_width))
        cond = jnp.zeros((1, cfg.text_embed_dim, 16, 16))
        p = trainer.model.init(key, latent, cond, jnp.zeros((1,), jnp.int32))
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, p)

    params = jax.jit(init_bf16)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    state = DiTTrainState(params=params, opt_state=None,
                          step=jnp.zeros((), jnp.int32))
    init_s = time.time() - t0

    B, H = args.batch, cfg.input_size
    cond = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (B, 3, H, H)), jnp.float32
    )

    t0 = time.time()
    lat = trainer.sample(state, cond, jax.random.PRNGKey(3))
    jax.block_until_ready(lat)
    compile_s = time.time() - t0

    best = 1e9
    for _ in range(2):
        t0 = time.time()
        for i in range(args.steps_timing):
            lat = trainer.sample(state, cond,
                                 jax.random.fold_in(jax.random.PRNGKey(3), i))
        jax.block_until_ready(lat)
        best = min(best, (time.time() - t0) / args.steps_timing)

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(state.params))
    print(json.dumps({
        "workload": f"{args.preset} B={B} {args.num_inference_steps}-step "
                    f"CFG sampling ({n_params/1e9:.2f}B params bf16)",
        "platform": jax.devices()[0].platform,
        "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "sample_s": round(best, 3),
        "s_per_denoise_step": round(best / args.num_inference_steps, 4),
    }))


if __name__ == "__main__":
    main()
