"""Image conditioning encoder (Sapiens-stand-in ViT, flax).

The reference conditions the DiT on features from a frozen external
Sapiens-1B torchscript model producing a 1536-channel feature map
(/root/reference/train_DiT.py:222-225, core/modules/encode/embeddings.py:8-23).
That checkpoint is an external download the reference also doesn't ship; here
the encoder is a pluggable interface:

* ``ViTFeatureEncoder`` — a standard patch ViT emitting [B, C, h, w] feature
  maps with Sapiens-compatible channel count (1536). Train it jointly, or
  load converted Sapiens weights into a matching geometry (documented swap —
  SURVEY.md §7 step 8 explicitly allows a substituted encoder).
* any callable (params, images[B,3,H,W]) -> [B, C, h, w] works in the
  trainer/pipeline.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.models.dit import sincos_2d


class ViTFeatureEncoder(nn.Module):
    """Patch ViT -> spatial feature map [B, embed_dim, H/p, W/p]."""

    embed_dim: int = 1536
    depth: int = 8
    heads: int = 12
    patch_size: int = 16

    @nn.compact
    def __call__(self, images):  # [B,3,H,W] (ImageNet-normalized)
        x = jnp.moveaxis(images, 1, -1)
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID")(x)
        b, gh, gw, d = x.shape
        x = x.reshape(b, gh * gw, d)
        x = x + jnp.asarray(sincos_2d(d, gh, gw))[None]
        heads = self.heads
        while d % heads:  # keep head count valid for small test widths
            heads -= 1
        for _ in range(self.depth):
            h = nn.LayerNorm()(x)
            h = nn.MultiHeadDotProductAttention(num_heads=heads)(h, h)
            x = x + h
            h = nn.LayerNorm()(x)
            h = nn.Dense(d * 4)(h)
            h = nn.gelu(h)
            h = nn.Dense(d)(h)
            x = x + h
        x = nn.LayerNorm()(x)
        return jnp.moveaxis(x.reshape(b, gh, gw, d), -1, 1)
