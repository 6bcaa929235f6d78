"""Sapiens ViT weight converter vs a plain-torch mmpretrain-style oracle."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from convert_sapiens import convert  # noqa: E402

from sigman_release_tpu.models.encoders import ViTFeatureEncoder  # noqa: E402

D, HEADS, DEPTH, P = 32, 4, 2, 16
GRID = 4  # 64^2 input / patch 16


def _torch_vit():
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ln1 = tnn.LayerNorm(D)
            self.attn = tnn.Module()
            self.attn.qkv = tnn.Linear(D, 3 * D)
            self.attn.proj = tnn.Linear(D, D)
            self.ln2 = tnn.LayerNorm(D)
            self.ffn = tnn.Module()
            self.ffn.layers = tnn.ModuleList(
                [tnn.Linear(D, 4 * D), tnn.Linear(4 * D, D)]
            )

        def forward(self, x):
            h = self.ln1(x)
            b, n, _ = h.shape
            qkv = self.attn.qkv(h).view(b, n, 3, HEADS, D // HEADS)
            q, k, v = (t.transpose(1, 2) for t in qkv.unbind(2))
            o = tF.scaled_dot_product_attention(q, k, v)
            o = o.transpose(1, 2).reshape(b, n, D)
            x = x + self.attn.proj(o)
            h = self.ln2(x)
            h = self.ffn.layers[1](tF.gelu(self.ffn.layers[0](h)))  # noqa
            return x + h

    class ViT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = tnn.Module()
            self.patch_embed.projection = tnn.Conv2d(3, D, P, stride=P)
            self.pos_embed = tnn.Parameter(
                torch.randn(1, GRID * GRID, D) * 0.02)
            self.layers = tnn.ModuleList([Block() for _ in range(DEPTH)])
            self.ln1_final = tnn.LayerNorm(D)  # renamed in sd below

        def forward(self, x):
            x = self.patch_embed.projection(x)
            b, _, gh, gw = x.shape
            x = x.flatten(2).transpose(1, 2) + self.pos_embed
            for blk in self.layers:
                x = blk(x)
            return self.ln1_final(x)

    return ViT().eval()


def test_sapiens_convert_torch_oracle(tmp_path):
    import torch

    torch.manual_seed(0)
    vit = _torch_vit()
    sd = {("backbone." + k).replace("ln1_final", "ln1")
          .replace("ffn.layers.0.", "ffn.layers.0.0."): v.detach().numpy()
          for k, v in vit.state_dict().items()}

    enc = ViTFeatureEncoder(embed_dim=D, depth=DEPTH, heads=HEADS,
                            patch_size=P, learned_pos=True,
                            learned_pos_tokens=GRID * GRID)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)))
    converted, stats = convert(sd, params, heads=HEADS, verbose=False)
    assert stats["hits"] > 0
    assert not stats["mismatches"], stats["mismatches"][:5]
    assert not stats["unmatched"], stats["unmatched"][:5]
    # every flax param was overwritten
    from flax.traverse_util import flatten_dict

    n_params = len(flatten_dict(params))
    assert stats["hits"] == n_params, (stats["hits"], n_params)

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_out = vit(torch.as_tensor(x)).numpy()          # [B, N, D]
    j = np.asarray(enc.apply(converted, jnp.asarray(x)))  # [B, D, gh, gw]
    j_tokens = j.reshape(2, D, -1).transpose(0, 2, 1)
    np.testing.assert_allclose(j_tokens, t_out, atol=3e-4, rtol=1e-3)
