#!/usr/bin/env python
"""CLI for sigman_release_tpu.convert — torch safetensors -> flax msgpack.

See the module docstring of :mod:`sigman_release_tpu.convert` for layout
coverage. Usage:

    python scripts/convert_reference_ckpt.py --ckpt autoencoder.safetensors \
        --out vae_params.msgpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sigman_release_tpu.convert import *  # noqa: F401,F403 (re-export for tests)
from sigman_release_tpu.convert import (
    apply_key_map, convert_dit, convert_disc, convert_vae, dit_key_map,
    disc_key_map, vae_key_map, VAE_EXPECTED_UNMAPPED,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="torch safetensors file")
    ap.add_argument("--model", default=None, choices=("dit", "vae", "disc"),
                    help="checkpoint family; inferred from keys if omitted")
    ap.add_argument("--preset", default=None)
    ap.add_argument("--out", default=None, help="msgpack output path")
    ap.add_argument("--check", action="store_true",
                    help="report mapping coverage only")
    args = ap.parse_args()

    from safetensors.numpy import load_file

    import jax
    import jax.numpy as jnp

    from sigman_release_tpu.config import PRESETS

    sd = load_file(args.ckpt)
    model_kind = args.model
    if model_kind is None:  # VAE leads with 'autoencoder.', disc with 'main.'
        model_kind = ("vae" if any(k.startswith("autoencoder.") for k in sd)
                      else "disc" if any(k.startswith("main.") for k in sd)
                      else "dit")
    cfg = PRESETS[args.preset or ("dit" if model_kind == "dit" else "vae_b")]

    if model_kind == "disc":
        from sigman_release_tpu.training.vae_trainer import VAETrainer

        trainer = VAETrainer(cfg)
        disc = trainer.discriminator
        params = jax.jit(disc.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1, 3, cfg.output_size, cfg.output_size)),
        )
        converted = convert_disc(sd, params, disc.n_layers)
    elif model_kind == "dit":
        from sigman_release_tpu.models.dit import DiTModel

        model = DiTModel(cfg)
        latent = jnp.zeros((1, cfg.in_channels, cfg.sample_height,
                            cfg.sample_width))
        cond = jnp.zeros((1, cfg.text_embed_dim, 16, 16))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), latent, cond,
                                     jnp.zeros((1,), jnp.int32))
        converted = convert_dit(sd, params, cfg.num_layers)
    else:
        from sigman_release_tpu.models.vae import VAEModel

        model = VAEModel(cfg)
        H, V = cfg.input_size, cfg.num_input_views
        images = jnp.zeros((1, V, 9, H, H))
        uv = jnp.zeros((1, 3, H, H))
        key = jax.random.PRNGKey(0)
        params = jax.jit(model.init)(
            {"params": key, "sample": key}, images, uv, key
        )
        converted = convert_vae(sd, params, cfg)
    if args.check or not args.out:
        return
    from sigman_release_tpu.training.checkpoint import save_checkpoint

    save_checkpoint(args.out, converted)
    print(f"[convert] wrote {args.out}")


if __name__ == "__main__":
    main()
