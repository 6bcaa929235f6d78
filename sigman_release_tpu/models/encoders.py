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


def sapiens_1b_encoder():
    """The substituted encoder at real Sapiens-1B geometry (embed 1536,
    depth 40, heads 24, patch 16, learned positions) — the shape
    ``scripts/convert_sapiens.py`` converts pretrained weights into."""
    return ViTFeatureEncoder(embed_dim=1536, depth=40, heads=24,
                             patch_size=16, learned_pos=True,
                             learned_pos_tokens=4096)


class ViTFeatureEncoder(nn.Module):
    """Patch ViT -> spatial feature map [B, embed_dim, H/p, W/p].

    ``learned_pos``: use a learned position table (Sapiens-style; the table
    is bilinearly resized to the input's token grid) instead of the sincos
    default — required to receive converted Sapiens weights.
    """

    embed_dim: int = 1536
    depth: int = 8
    heads: int = 12
    patch_size: int = 16
    learned_pos: bool = False
    learned_pos_tokens: int = 4096   # table length (64x64 grid at 1024^2/16)

    @nn.compact
    def __call__(self, images):  # [B,3,H,W] (ImageNet-normalized)
        import jax

        x = jnp.moveaxis(images, 1, -1)
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    name="patch_proj")(x)
        b, gh, gw, d = x.shape
        x = x.reshape(b, gh * gw, d)
        if self.learned_pos:
            table = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (1, self.learned_pos_tokens, d),
            )
            side = int(self.learned_pos_tokens ** 0.5)
            grid = table.reshape(1, side, side, d)
            if (gh, gw) != (side, side):
                grid = jax.image.resize(grid, (1, gh, gw, d),
                                        method="bilinear")
            x = x + grid.reshape(1, gh * gw, d)
        else:
            x = x + jnp.asarray(sincos_2d(d, gh, gw))[None]
        heads = self.heads
        while d % heads:  # keep head count valid for small test widths
            heads -= 1
        for i in range(self.depth):
            h = nn.LayerNorm(name=f"blocks_{i}_ln1")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=heads, name=f"blocks_{i}_attn"
            )(h, h)
            x = x + h
            h = nn.LayerNorm(name=f"blocks_{i}_ln2")(x)
            h = nn.Dense(d * 4, name=f"blocks_{i}_ffn1")(h)
            # exact gelu: Sapiens/mmpretrain use nn.GELU() (erf form)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(d, name=f"blocks_{i}_ffn2")(h)
            x = x + h
        x = nn.LayerNorm(name="norm_out")(x)
        return jnp.moveaxis(x.reshape(b, gh, gw, d), -1, 1)
