#!/usr/bin/env python
"""VAE training entry point.

Usage (mirrors the reference CLI, /root/reference/train_vae.py):
    python train_vae.py vae_b --batch_size 8 --workspace ./workspace
    python train_vae.py test_tiny --synthetic_data true --num_epochs 1
"""

import os

import jax

from sigman_release_tpu.config import parse_cli
from sigman_release_tpu.data import DataLoader, HGSDataset, SyntheticAvatarDataset, shard_for_host
from sigman_release_tpu.parallel.mesh import initialize_multihost
from sigman_release_tpu.training.vae_trainer import VAETrainer


def main():
    cfg = parse_cli(default_preset="vae_b")
    initialize_multihost(
        coordinator=os.environ.get("COORDINATOR_ADDRESS"),
        num_processes=int(os.environ.get("NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("PROCESS_ID", "0")),
    )

    trainer = VAETrainer(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    state, lpips_params = trainer.init_state(key)
    if cfg.resume:
        state = trainer.resume(state, cfg.resume)

    if cfg.synthetic_data:
        dataset = SyntheticAvatarDataset(cfg, n_items=cfg.synthetic_items)
        eval_dataset = SyntheticAvatarDataset(cfg, n_items=2, seed=999)
    else:
        dataset = HGSDataset(cfg, training=True)
        dataset.items = shard_for_host(dataset.items)
        eval_dataset = HGSDataset(cfg, training=False)
    loader = DataLoader(dataset, cfg.batch_size, num_workers=cfg.num_workers,
                        seed=cfg.seed)
    eval_loader = DataLoader(eval_dataset, cfg.batch_size, shuffle=False,
                             num_workers=1)

    os.makedirs(cfg.workspace, exist_ok=True)
    from sigman_release_tpu.utils.logging import MetricLogger

    logger = MetricLogger(cfg.workspace, name="vae")
    steps_per_epoch = max(1, len(loader))
    trainer.fit(
        loader, state, lpips_params,
        num_steps=cfg.num_epochs * steps_per_epoch,
        log_every=cfg.log_every,
        ckpt_path=os.path.join(cfg.workspace, "vae_state.msgpack"),
        logger=logger,
        eval_loader=eval_loader,
        eval_every=cfg.eval_steps,
        profile_dir=cfg.profile_dir or None,
        profile_every=cfg.profile_every,
    )


if __name__ == "__main__":
    main()
