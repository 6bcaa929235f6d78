#!/usr/bin/env python
"""VAE evaluation: encode -> decode -> render -> PSNR/SSIM/LPIPS.

Equivalent of /root/reference/scripts/test_vae.py:35-116.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from sigman_release_tpu.config import parse_cli
from sigman_release_tpu.data import DataLoader, HGSDataset, SyntheticAvatarDataset
from sigman_release_tpu.training.vae_trainer import VAETrainer


def main():
    cfg = parse_cli(default_preset="vae_b")
    trainer = VAETrainer(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    state, lpips_params = trainer.init_state(key)
    if cfg.resume and os.path.exists(cfg.resume):
        state = trainer.resume(state, cfg.resume)

    if cfg.synthetic_data:
        dataset = SyntheticAvatarDataset(cfg, n_items=4)
    else:
        dataset = HGSDataset(cfg, training=False)
    loader = DataLoader(dataset, cfg.batch_size, shuffle=False,
                        num_workers=cfg.num_workers)

    from sigman_release_tpu.parallel.mesh import shard_batch
    from sigman_release_tpu.utils.visualize import save_visualization

    sums = {}
    for i, batch in enumerate(loader):
        sharded = shard_batch(batch, trainer.mesh)
        metrics, outputs = trainer.eval_step(state, sharded, lpips_params,
                                             key)
        for k, v in metrics.items():
            sums.setdefault(k, []).append(float(v))
        if i < 4:
            save_visualization(
                outputs, os.path.join(cfg.workspace, f"eval_vis_{i:02d}.png")
            )
    n = len(next(iter(sums.values()), []))
    print("  ".join(f"{k} {np.mean(v):.4f}" for k, v in sums.items())
          + f"  ({n} batches)")


if __name__ == "__main__":
    main()
