"""CogVideoX-style diffusion transformer (flax.linen).

Parity with the reference's DiT3DModel/DiTBlock
(/root/reference/core/modules/DiT.py:37-486, DiT_utils.py):

* patch embed: conv-patchify the 16x64x64 latent (p=2 -> 1024 tokens) and
  conv-4x4-stride-4 project the Sapiens 1536-ch feature map into 256
  conditioning tokens; joint 2D-sincos table added over [cond; image]
  (PatchEmbed_2D_SAPIENS, DiT_utils.py:535-630),
* 30 blocks: AdaLN-zero (6-way shift/scale/gate for both streams,
  LayerNormZero DiT_utils.py:726-748), joint self-attention over
  [cond; image] with per-head RMS qk-norm and 2D RoPE applied to the image
  slice only, gelu-approx FFN over the concatenated streams,
* final LayerNorm over the joint sequence, AdaLayerNorm (shift/scale) from the
  time embedding, linear proj to p*p*out_channels, unpatchify.

TPU notes: pure einsum/SDPA attention (seq len 1280 — XLA-fused), bf16-ready,
remat per block via cfg.gradient_checkpointing.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.config import Config


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------

def timestep_sinusoid(t: jnp.ndarray, dim: int, flip: bool = True,
                      max_period: float = 10000.0) -> jnp.ndarray:
    """diffusers Timesteps: [B] -> [B, dim] (cos|sin order when flipped)."""
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    sin, cos = jnp.sin(args), jnp.cos(args)
    return jnp.concatenate([cos, sin] if flip else [sin, cos], axis=-1)


def sincos_2d(embed_dim: int, grid_h: int, grid_w: int,
              interpolation_scale: float = 1.875,
              base_size: int = 16) -> np.ndarray:
    """2D sincos position table [grid_h*grid_w, embed_dim].

    Bit-exact with diffusers ``get_2d_sincos_pos_embed(embed_dim, (W, H),
    interpolation_scale=...)`` as called by the reference's
    PatchEmbed_2D_SAPIENS (/root/reference/core/modules/DiT_utils.py:583-588):
    for a square grid the first half of the dim encodes the *column*
    coordinate and the second the row, and positions are divided by both
    ``grid/base_size`` and ``interpolation_scale`` (diffusers' base-size
    rescale — omitted in most re-implementations).
    """
    assert grid_h == grid_w, "reference only uses square grids (64/2 = 32)"

    def one_dim(dim, pos):
        omega = 1.0 / 10000.0 ** (np.arange(dim // 2) / (dim / 2.0))
        out = np.einsum("p,d->pd", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    scale_h = (grid_h / base_size) * interpolation_scale
    scale_w = (grid_w / base_size) * interpolation_scale
    rows = np.arange(grid_h, dtype=np.float64)
    cols = np.arange(grid_w, dtype=np.float64)
    col_of = np.tile(cols, grid_h) / scale_h     # token p -> its column
    row_of = np.repeat(rows, grid_w) / scale_w   # token p -> its row
    emb_col = one_dim(embed_dim // 2, col_of)
    emb_row = one_dim(embed_dim // 2, row_of)
    return np.concatenate([emb_col, emb_row], axis=1).astype(np.float32)


def rope_2d(head_dim: int, grid_h: int, grid_w: int,
            theta: float = 10000.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2D axial rotary embedding (diffusers get_2d_rotary_pos_embed layout).

    Returns (cos, sin) [grid_h*grid_w, head_dim]. Matches the reference's
    prepare_rotary_positional_embeddings (/root/reference/train_DiT.py:34-78)
    -> diffusers get_2d_rotary_pos_embed: ``grid = meshgrid(grid_w, grid_h)``
    puts the *column* coordinate in grid[0], so the FIRST half of the head
    dims rotates with the column and the second half with the row.
    """

    def one_dim(dim, pos):
        inv = 1.0 / theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
        ang = np.outer(pos, inv)                    # [S, dim/2]
        cos = np.repeat(np.cos(ang), 2, axis=1)
        sin = np.repeat(np.sin(ang), 2, axis=1)
        return cos, sin

    rows = np.arange(grid_h, dtype=np.float64)
    cols = np.arange(grid_w, dtype=np.float64)
    ch, sh = one_dim(head_dim // 2, rows)           # [H, hd/2]
    cw, sw = one_dim(head_dim // 2, cols)
    cos = np.concatenate(
        [np.tile(cw, (grid_h, 1)),
         np.repeat(ch, grid_w, axis=0)], axis=1,
    )
    sin = np.concatenate(
        [np.tile(sw, (grid_h, 1)),
         np.repeat(sh, grid_w, axis=0)], axis=1,
    )
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x [B,S,h,d]; cos/sin [S,d]. Interleaved-pair rotation
    ((x0,x1) -> (x0 c - x1 s, x1 c + x0 s)), diffusers use_real semantics."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)
    return x * cos[None, :, None, :] + rot * sin[None, :, None, :]


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

class RMSNormPerHead(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):  # [..., d]
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps) * scale).astype(x.dtype)


class JointAttention(nn.Module):
    """Self-attention over [cond; image] with RoPE on the image slice."""

    dim: int
    heads: int
    head_dim: int
    # reference DiT3DModel default attention_bias=True (DiT.py:232, not
    # overridden by train_DiT.py:206) -> qkv projections carry biases
    use_bias: bool = True

    @nn.compact
    def __call__(self, image, cond, rope):
        x = jnp.concatenate([cond, image], axis=1)
        s_cond = cond.shape[1]
        b, s, _ = x.shape
        inner = self.heads * self.head_dim

        def proj(name):
            return nn.Dense(inner, use_bias=self.use_bias, name=name)(
                x
            ).reshape(b, s, self.heads, self.head_dim)

        q = RMSNormPerHead(self.head_dim, name="norm_q")(proj("to_q"))
        k = RMSNormPerHead(self.head_dim, name="norm_k")(proj("to_k"))
        v = proj("to_v")
        if rope is not None:
            cos, sin = rope
            q = q.at[:, s_cond:].set(apply_rope(q[:, s_cond:], cos, sin))
            k = k.at[:, s_cond:].set(apply_rope(k[:, s_cond:], cos, sin))
        out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(b, s, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return out[:, s_cond:], out[:, :s_cond]


class AdaLNZero(nn.Module):
    """temb -> 6-way (shift, scale, gate) x (image, cond); shared LayerNorm."""

    dim: int

    @nn.compact
    def __call__(self, image, cond, temb):
        mods = nn.Dense(6 * self.dim)(nn.silu(temb))     # [B, 6D]
        sh, sc, gate, esh, esc, egate = jnp.split(mods, 6, axis=-1)
        norm = nn.LayerNorm(epsilon=1e-5)
        image = norm(image) * (1 + sc[:, None]) + sh[:, None]
        cond = norm(cond) * (1 + esc[:, None]) + esh[:, None]
        return image, cond, gate[:, None], egate[:, None]


class FeedForward(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * self.mult)(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(self.dim)(h)


class DiTBlock(nn.Module):
    dim: int
    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, image, cond, temb, rope):
        n_img, n_cond, g_img, g_cond = AdaLNZero(self.dim, name="norm1")(
            image, cond, temb
        )
        a_img, a_cond = JointAttention(
            self.dim, self.heads, self.head_dim, name="attn1"
        )(n_img, n_cond, rope)
        image = image + g_img * a_img
        cond = cond + g_cond * a_cond

        n_img, n_cond, g_img, g_cond = AdaLNZero(self.dim, name="norm2")(
            image, cond, temb
        )
        joint = jnp.concatenate([n_cond, n_img], axis=1)
        ff = FeedForward(self.dim, name="ff")(joint)
        s = cond.shape[1]
        image = image + g_img * ff[:, s:]
        cond = cond + g_cond * ff[:, :s]
        return image, cond


class PatchEmbed(nn.Module):
    """Latent patchify + Sapiens conditioning projection + joint pos table."""

    cfg: Config

    @nn.compact
    def __call__(self, latent, cond_feats):
        # latent [B,h,w,C]; cond_feats [B,hc,wc,1536]
        c = self.cfg
        dim = c.hidden_dim
        p = c.patch_size
        img = nn.Conv(dim, (p, p), strides=(p, p), padding="VALID",
                      name="proj")(latent)
        b, gh, gw, _ = img.shape
        img = img.reshape(b, gh * gw, dim)
        cond = nn.Conv(dim, (4, 4), strides=(4, 4), padding="VALID",
                       name="cond_proj")(cond_feats)
        cond = cond.reshape(b, -1, dim)
        # joint sincos table: zeros over the cond rows, 2D sincos over image
        # rows (PatchEmbed_2D_SAPIENS._get_positional_embeddings) — so only
        # image tokens receive a position offset. The reference gates this
        # on NOT use_rotary_positional_embeddings (DiT.py:270), and the
        # shipped config uses RoPE — so the default run adds no sincos.
        if not c.use_rotary_positional_embeddings:
            pos = jnp.asarray(sincos_2d(dim, gh, gw))
            img = img + pos[None]
        return img, cond


class DiTModel(nn.Module):
    """Full transformer: latent + cond features + timestep -> v-prediction."""

    cfg: Config

    @nn.compact
    def __call__(self, latent, cond_feats, timestep):
        """latent [B,C,h,w] (reference layout), cond_feats [B,1536,hc,wc],
        timestep [B] -> [B,out_channels,h,w]."""
        c = self.cfg
        dim = c.hidden_dim
        latent = jnp.moveaxis(latent, 1, -1)
        cond_feats = jnp.moveaxis(cond_feats, 1, -1)
        b, h, w, _ = latent.shape
        p = c.patch_size
        gh, gw = h // p, w // p

        t_emb = timestep_sinusoid(timestep, dim)
        temb = nn.Dense(c.time_embed_dim, name="time_emb_1")(t_emb)
        temb = nn.silu(temb)
        temb = nn.Dense(c.time_embed_dim, name="time_emb_2")(temb)

        image, cond = PatchEmbed(c, name="patch_embed")(latent, cond_feats)

        rope = rope_2d(c.attention_head_dim, gh, gw) if (
            c.use_rotary_positional_embeddings
        ) else None

        block = DiTBlock
        if c.gradient_checkpointing:
            block = nn.remat(DiTBlock, static_argnums=())
        for i in range(c.num_layers):
            image, cond = block(
                dim, c.num_attention_heads, c.attention_head_dim,
                name=f"block_{i}",
            )(image, cond, temb, rope)

        joint = jnp.concatenate([cond, image], axis=1)
        joint = nn.LayerNorm(epsilon=1e-5, name="norm_final")(joint)
        image = joint[:, cond.shape[1]:]

        # AdaLayerNorm (shift/scale) + projection
        mods = nn.Dense(2 * dim, name="norm_out_proj")(nn.silu(temb))
        shift, scale = jnp.split(mods, 2, axis=-1)
        image = nn.LayerNorm(epsilon=1e-5, name="norm_out")(image)
        image = image * (1 + scale[:, None]) + shift[:, None]
        out = nn.Dense(p * p * c.out_channels, name="proj_out")(image)

        # unpatchify -> [B, C, h, w]
        out = out.reshape(b, gh, gw, c.out_channels, p, p)
        out = jnp.einsum("bhwcpq->bchpwq", out).reshape(
            b, c.out_channels, gh * p, gw * p
        )
        return out
