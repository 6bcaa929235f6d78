"""LPIPS perceptual loss (VGG16 / AlexNet backbones) in flax.

Re-implementation of the reference's clean LPIPS
(/root/reference/core/loss/lpips.py:194-243): backbone feature slices
(VGG16 relu1_2/2_2/3_3/4_3/5_3 for the training loss, whole_loss.py:122;
AlexNet relu1-5 for eval, core/loss/eval.py:72 — ``net="alex"``),
unit-normalize channels, 1x1 linear heads, spatial mean, sum over layers.
Inputs are expected in [-1, 1] and are normalized with the LPIPS
shift/scale constants.

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

# channel counts of the five relu slices per backbone
VGG_CHANNELS = (64, 128, 256, 512, 512)
ALEX_CHANNELS = (64, 192, 384, 256, 256)

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


class AlexSlices(nn.Module):
    """AlexNet feature extractor returning the five relu slice outputs
    (torchvision ``alexnet().features`` geometry — the reference's eval
    backbone, core/loss/lpips.py:69-112: conv 11x11/s4/p2 -> maxpool3/s2 ->
    conv 5x5/p2 -> maxpool3/s2 -> three 3x3 convs, relu taps after each
    conv)."""

    @nn.compact
    def __call__(self, x):  # [B,H,W,3] in lpips-normalized space
        outs = []
        cfg = [(11, 4, 2, 64), (5, 1, 2, 192), (3, 1, 1, 384),
               (3, 1, 1, 256), (3, 1, 1, 256)]
        for i, (k, s, p, ch) in enumerate(cfg):
            if i in (1, 2):                     # overlapping 3x3/s2 maxpool
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.relu(nn.Conv(ch, (k, k), strides=(s, s),
                                padding=((p, p), (p, p)),
                                name=f"conv{i}")(x))
            outs.append(x)
        return outs


class LPIPS(nn.Module):
    """lpips(x, y): x/y [B,3,H,W] in [-1,1] -> [B] distances."""

    net: str = "vgg"                 # "vgg" (loss) | "alex" (reference eval)
    use_dropout_heads: bool = False  # heads are 1x1 convs; dropout off at eval

    @nn.compact
    def __call__(self, x, y):
        def prep(t):
            t = jnp.moveaxis(t, 1, -1)          # NHWC
            return (t - SHIFT) / SCALE

        if self.net == "alex":
            backbone = AlexSlices(name="alex")
            chns = ALEX_CHANNELS
        else:
            backbone = VGG16Slices(name="vgg")
            chns = VGG_CHANNELS
        fx = backbone(prep(x))
        fy = backbone(prep(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            # positive init: without converted richzhang weights the random
            # fallback must still behave like a distance (nonneg, 0 iff equal)
            w = nn.Conv(
                1, (1, 1), use_bias=False, name=f"lin{i}",
                kernel_init=nn.initializers.constant(1.0 / chns[i]),
            )(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def load_lpips_params(backbone_path: Optional[str] = None,
                      lin_path: Optional[str] = None,
                      net: str = "vgg") -> Optional[Dict]:
    """Convert a torch backbone (torchvision ``vgg16``/``alexnet``
    state_dict) + richzhang lin weights into the flax param tree for
    :class:`LPIPS`. Returns None if paths are missing — caller falls back
    to seeded random init."""
    if not backbone_path:
        return None
    import torch

    sd = torch.load(backbone_path, map_location="cpu", weights_only=True)
    params: Dict[str, Any] = {net: {}}
    if net == "alex":
        # torchvision alexnet.features conv indices (one conv per slice)
        chns = ALEX_CHANNELS
        for i, idx in enumerate((0, 3, 6, 8, 10)):
            w = sd[f"features.{idx}.weight"].numpy().transpose(2, 3, 1, 0)
            b = sd[f"features.{idx}.bias"].numpy()
            params["alex"][f"conv{i}"] = {
                "kernel": jnp.asarray(w), "bias": jnp.asarray(b)
            }
    else:
        chns = VGG_CHANNELS
        cfg = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]
        # torchvision vgg16.features conv indices
        conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        flat = iter(conv_idx)
        for bi, (n_convs, _ch) in enumerate(cfg):
            for ci in range(n_convs):
                idx = next(flat)
                w = sd[f"features.{idx}.weight"].numpy() \
                    .transpose(2, 3, 1, 0)                # OIHW -> HWIO
                b = sd[f"features.{idx}.bias"].numpy()
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
                "kernel": jnp.full((1, 1, chns[i], 1),
                                   1.0 / chns[i], jnp.float32)
            }
    return {"params": params}
