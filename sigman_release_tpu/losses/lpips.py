"""LPIPS perceptual loss (VGG16 backbone) in flax.

Re-implementation of the reference's clean LPIPS
(/root/reference/core/loss/lpips.py:194-243): VGG16 feature slices
(relu1_2/2_2/3_3/4_3/5_3), unit-normalize channels, 1x1 linear heads,
spatial mean, sum over layers. Inputs are expected in [-1, 1] and are
normalized with the LPIPS shift/scale constants.

Weights: this image has no torchvision and no network egress, so pretrained
VGG16 + lin weights cannot be downloaded here. ``load_lpips_params`` converts
a user-provided torch checkpoint (torchvision VGG16 ``.pth`` + richzhang lin
weights) into the flax parameter tree. Without one, ``LPIPS.init`` gives a
fixed-seed random backbone — random VGG features are a serviceable perceptual
proxy for smoke tests, but real training should supply converted weights
(documented in README).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# channel counts of the five VGG16 relu slices
VGG_CHANNELS = (64, 128, 256, 512, 512)

SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Slices(nn.Module):
    """VGG16 feature extractor returning the five relu slice outputs."""

    @nn.compact
    def __call__(self, x):  # [B,H,W,3] in lpips-normalized space
        outs = []
        cfg = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]
        for bi, (n_convs, ch) in enumerate(cfg):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"conv{bi}_{ci}")(x)
                x = nn.relu(x)
            outs.append(x)
            if bi < len(cfg) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return outs


class LPIPS(nn.Module):
    """lpips(x, y): x/y [B,3,H,W] in [-1,1] -> [B] distances."""

    use_dropout_heads: bool = False  # heads are 1x1 convs; dropout off at eval

    @nn.compact
    def __call__(self, x, y):
        def prep(t):
            t = jnp.moveaxis(t, 1, -1)          # NHWC
            return (t - SHIFT) / SCALE

        vgg = VGG16Slices(name="vgg")
        fx = vgg(prep(x))
        fy = vgg(prep(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            # positive init: without converted richzhang weights the random
            # fallback must still behave like a distance (nonneg, 0 iff equal)
            w = nn.Conv(
                1, (1, 1), use_bias=False, name=f"lin{i}",
                kernel_init=nn.initializers.constant(1.0 / VGG_CHANNELS[i]),
            )(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def load_lpips_params(vgg_path: Optional[str] = None,
                      lin_path: Optional[str] = None) -> Optional[Dict]:
    """Convert torch VGG16 (torchvision state_dict) + richzhang lin weights
    into the flax param tree for :class:`LPIPS`. Returns None if paths are
    missing — caller falls back to seeded random init."""
    if not vgg_path:
        return None
    import torch

    sd = torch.load(vgg_path, map_location="cpu", weights_only=True)
    cfg = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]
    # torchvision vgg16.features conv indices
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params: Dict[str, Any] = {"vgg": {}}
    flat = iter(conv_idx)
    for bi, (n_convs, _ch) in enumerate(cfg):
        for ci in range(n_convs):
            idx = next(flat)
            wkey = f"features.{idx}.weight"
            bkey = f"features.{idx}.bias"
            w = sd[wkey].numpy().transpose(2, 3, 1, 0)   # OIHW -> HWIO
            b = sd[bkey].numpy()
            params["vgg"][f"conv{bi}_{ci}"] = {
                "kernel": jnp.asarray(w), "bias": jnp.asarray(b)
            }
    if lin_path:
        lin_sd = torch.load(lin_path, map_location="cpu", weights_only=True)
        for i in range(5):
            key = f"lin{i}.model.1.weight"
            w = lin_sd[key].numpy().transpose(2, 3, 1, 0)
            params[f"lin{i}"] = {"kernel": jnp.asarray(w)}
    else:
        for i in range(5):
            params[f"lin{i}"] = {
                "kernel": jnp.full((1, 1, VGG_CHANNELS[i], 1),
                                   1.0 / VGG_CHANNELS[i], jnp.float32)
            }
    return {"params": params}
