#!/usr/bin/env python
"""DiT training entry point (latent diffusion over the frozen VAE).

Usage (mirrors /root/reference/train_DiT.py):
    python train_DiT.py dit --batch_size 8 --vae_path ./workspace/vae_state.msgpack
"""

import os

import jax

from sigman_release_tpu.config import parse_cli
from sigman_release_tpu.data import DataLoader, HGSDataset, SyntheticAvatarDataset, shard_for_host
from sigman_release_tpu.parallel.mesh import initialize_multihost
from sigman_release_tpu.training.checkpoint import load_checkpoint
from sigman_release_tpu.training.dit_trainer import DiTTrainer


def main():
    cfg = parse_cli(default_preset="dit")
    initialize_multihost(
        coordinator=os.environ.get("COORDINATOR_ADDRESS"),
        num_processes=int(os.environ.get("NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("PROCESS_ID", "0")),
    )
    key = jax.random.PRNGKey(cfg.seed)

    # frozen VAE + conditioning encoder
    from sigman_release_tpu.models.encoders import ViTFeatureEncoder
    from sigman_release_tpu.models.vae import VAEModel
    import jax.numpy as jnp

    vae = VAEModel(cfg)
    k1, k2, k3 = jax.random.split(key, 3)
    H, V = cfg.input_size, cfg.num_input_views
    vae_params = vae.init(
        {"params": k1, "sample": k1},
        jnp.zeros((1, V, 9, H, H)), jnp.zeros((1, 3, H, H)), k1,
    )
    if cfg.vae_path and os.path.exists(cfg.vae_path):
        # format-sniffing load: our msgpack (full state OR bare params) and
        # the reference's autoencoder.safetensors both work directly
        from sigman_release_tpu.training.checkpoint import load_params_any

        vae_params = load_params_any(cfg.vae_path, vae_params, cfg)
    elif cfg.vae_path:
        print(f"[train_DiT] WARNING: vae_path {cfg.vae_path!r} not found — "
              "training against a RANDOM frozen VAE (latents are meaningless;"
              " pass --vae_path to a trained/converted checkpoint)")
    if cfg.sapiens_path and os.path.exists(cfg.sapiens_path):
        # converted real Sapiens-1B weights (scripts/convert_sapiens.py)
        from sigman_release_tpu.models.encoders import sapiens_1b_encoder

        encoder = sapiens_1b_encoder()
        enc_params = encoder.init(k2, jnp.zeros((1, 3, 64, 64)))
        from sigman_release_tpu.training.checkpoint import tolerant_restore as _tr

        enc_params = _tr(enc_params, load_checkpoint(cfg.sapiens_path))
    else:
        # no converted Sapiens weights: train at REAL Sapiens-1B geometry
        # (1536d/40L/24h — not a toy depth) so converted weights drop in
        # later, and say loudly that conditioning starts untrained
        # (reference: frozen pretrained Sapiens, train_DiT.py:222-225)
        print("[train_DiT] WARNING: no --sapiens_path — conditioning "
              "encoder is randomly initialized at Sapiens-1B geometry; "
              "convert real weights with scripts/convert_sapiens.py for "
              "reference-parity conditioning")
        if cfg.text_embed_dim == 1536:
            from sigman_release_tpu.models.encoders import sapiens_1b_encoder

            encoder = sapiens_1b_encoder()
        else:  # small test configs keep a matching-width encoder
            encoder = ViTFeatureEncoder(embed_dim=cfg.text_embed_dim)
        enc_params = encoder.init(k2, jnp.zeros((1, 3, 64, 64)))

    # decode+deform+render stack for the in-training sampling eval
    # (reference train_DiT.py:417-457): the frozen VAE's decode_uv path
    from sigman_release_tpu.training.vae_trainer import VAETrainer

    vae_trainer = VAETrainer(cfg)
    latent_renderer = (
        lambda z, batch: vae_trainer.render_latent(vae_params, z, batch)
    )

    trainer = DiTTrainer(cfg, vae_params=vae_params, encoder_params=enc_params,
                         latent_renderer=latent_renderer, spmd=cfg.spmd)
    state = trainer.init_state(k3)
    if cfg.resume:
        state = trainer.resume(state, cfg.resume)

    if cfg.synthetic_data:
        dataset = SyntheticAvatarDataset(cfg, n_items=cfg.synthetic_items)
        eval_dataset = SyntheticAvatarDataset(
            cfg, n_items=min(4, cfg.synthetic_items), seed=cfg.seed + 999
        )
    else:
        dataset = HGSDataset(cfg, training=True)
        dataset.items = shard_for_host(dataset.items)
        eval_dataset = HGSDataset(cfg, training=False)
    loader = DataLoader(dataset, cfg.batch_size, num_workers=cfg.num_workers,
                        seed=cfg.seed)
    eval_loader = DataLoader(eval_dataset, cfg.batch_size, shuffle=False,
                             num_workers=cfg.num_workers)

    os.makedirs(cfg.workspace, exist_ok=True)
    from sigman_release_tpu.utils.logging import MetricLogger

    logger = MetricLogger(cfg.workspace, name="dit")
    steps_per_epoch = max(1, len(loader))
    trainer.fit(
        loader, state,
        num_steps=cfg.num_epochs * steps_per_epoch,
        log_every=cfg.log_every,
        ckpt_path=os.path.join(cfg.workspace, "dit_state.msgpack"),
        logger=logger,
        eval_loader=eval_loader,
        eval_every=cfg.eval_steps,
        profile_dir=cfg.profile_dir or None,
        profile_every=cfg.profile_every,
    )


if __name__ == "__main__":
    main()
