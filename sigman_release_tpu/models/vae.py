"""UV-space Gaussian VAE (flax.linen, channels-last / NHWC — TPU native).

Architecture parity with the reference's Conv_VAE + VAE wrapper
(/root/reference/core/modules/autoencoder.py:18-497, vae_utils.py):

* encoder: 3D conv stack over (V, H, W) — conv_in + 4 DownBlock3D
  (channels 128/256/256/512, 2 resnets each, stride-2 spatial downsample
  between blocks) taking the 9-channel input (RGB + Plucker) to
  (B, V, H/8, W/8, 512) tokens,
* UV-query bottleneck: learned 64x64 query grid concat a conv encoding of
  the initial UV albedo, sincos position table, one cross-attention over the
  encoder tokens then N conv||self-attention blocks,
* linear projection to 2*latent channels -> DiagonalGaussian,
* decoder: 2D conv stack (conv_in + 4 UpBlock2D, channels 1024/512/512/256,
  3 resnets each, x2 nearest upsample between) from the 64x64 latent to the
  out_channels UV feature map at input resolution,
* heads: 3x3 convs geo (10ch: opacity1+offset3+scale3+rot3) and rgb (3ch);
  activations sigmoid everywhere, scale=(s-0.5)*2, rot=(s-0.5)*pi
  (autoencoder.py:292-309).

Differences by design (TPU): channels-last layouts, no SafeConv3d chunking
(XLA tiles convs itself), attention via jnp einsum/SDPA, explicit PRNG keys.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.config import Config
from sigman_release_tpu.ops.grid_sample import grid_sample_2d
from sigman_release_tpu.ops.rotations import rodrigues


def _num_groups(channels: int, cap: int = 32) -> int:
    """Largest divisor of ``channels`` that is <= cap (GroupNorm groups)."""
    return math.gcd(cap, channels)


class ResnetBlock(nn.Module):
    """GN -> SiLU -> conv -> GN -> SiLU -> conv with 1x1 shortcut; 2D or 3D.

    Submodule names mirror the reference ResnetBlock2D/3D (vae_utils.py:
    norm1/conv1/norm2/conv2/conv_shortcut) so checkpoint conversion is a
    mechanical rename.
    """

    out_channels: int
    dims: int = 2

    @nn.compact
    def __call__(self, x):
        from jax.ad_checkpoint import checkpoint_name

        k = (3,) * self.dims
        h = nn.GroupNorm(num_groups=_num_groups(x.shape[-1]), epsilon=1e-6,
                         name="norm1")(x)
        h = nn.silu(h)
        # conv outputs are tagged so the 'conv' remat policy can SAVE them
        # and recompute only the cheap GN/SiLU chains in backward (the
        # blanket per-resnet remat recomputes the convs too — ~1/3 of the
        # train step's executed FLOPs, PERF.md round 4). No-op otherwise.
        h = checkpoint_name(
            nn.Conv(self.out_channels, k, padding="SAME", name="conv1")(h),
            "vae_conv_out")
        h = nn.GroupNorm(num_groups=_num_groups(self.out_channels),
                         epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = checkpoint_name(
            nn.Conv(self.out_channels, k, padding="SAME", name="conv2")(h),
            "vae_conv_out")
        if x.shape[-1] != self.out_channels:
            x = checkpoint_name(
                nn.Conv(self.out_channels, (1,) * self.dims,
                        name="conv_shortcut")(x),
                "vae_conv_out")
        return x + h


def _resnet_for(mode: str):
    """Remat flavor for the conv stacks (Config.remat_policy):

    * "block" — per-resnet full remat (saves only each resnet's input;
      recomputes convs AND norms in backward — the reference's
      gradient_checkpointing semantics, vae_utils.py:476),
    * "conv"  — per-resnet remat that SAVES the tagged conv outputs and
      recomputes only GN/SiLU (VPU-cheap); ~3x the saved bytes of "block"
      on the conv stack, in exchange for skipping the conv recompute,
    * "none"  — no remat (OOMs a 16 GB chip at vae_b 512^2 scale).

    The Config-level policy "conv_enc" (round 5) maps to "conv" on the 3D
    encoder and "block" on the 2D decoder: whole-model "conv" misses the
    16 GB chip by ~80 MB at vae_b B=1 V=10 (the decoder's 512^2 x 512ch
    f32 saved activations, plus a pathologically-padded assemble-transpose
    copy the layout assigner emits under that pressure), while the encoder
    is where the conv recompute actually costs (round-4 table: encoder
    534 ms vs decoder 319 ms of the 1.13 s G step).
    """
    if mode == "none":
        return ResnetBlock
    if mode == "conv":
        policy = jax.checkpoint_policies.save_only_these_names("vae_conv_out")
        return nn.remat(ResnetBlock, policy=policy)
    assert mode == "block", f"unknown remat_policy {mode!r}"
    return nn.remat(ResnetBlock)


def _stack_modes(policy: str):
    """Config.remat_policy -> (encoder_mode, decoder_mode)."""
    if policy == "conv_enc":
        return "conv", "block"
    return policy, policy


class Downsample2D(nn.Module):
    """Asymmetric (0,1) pad + stride-2 conv, applied per view frame."""

    out_channels: int

    @nn.compact
    def __call__(self, x):  # [..., H, W, C]
        pad = [(0, 0)] * (x.ndim - 3) + [(0, 1), (0, 1), (0, 0)]
        x = jnp.pad(x, pad)
        squeeze = x.ndim == 5
        if squeeze:  # fold views into batch for the 2D conv
            b, v, h, w, c = x.shape
            x = x.reshape(b * v, h, w, c)
        x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                    padding="VALID", name="conv")(x)
        if squeeze:
            x = x.reshape(b, v, x.shape[1], x.shape[2], x.shape[3])
        return x


class Encoder3D(nn.Module):
    """conv_in + 4 DownBlock3D over (B, V, H, W, C).

    ``remat``: rematerialize each resnet in backward — the reference
    checkpoints its encoder blocks (vae_utils.py:476
    gradient_checkpointing=True); at 512^2 x 6 views the un-remat'd
    activations OOM a 16GB chip."""

    block_channels: Sequence[int] = (128, 256, 256, 512)
    layers_per_block: int = 2
    remat_mode: str = "block"

    @nn.compact
    def __call__(self, x):  # [B, V, H, W, 9]
        block = _resnet_for(self.remat_mode)
        x = nn.Conv(self.block_channels[0], (3, 3, 3), padding="SAME",
                    name="conv_in")(x)
        n = len(self.block_channels)
        for i, ch in enumerate(self.block_channels):
            for j in range(self.layers_per_block):
                x = block(ch, dims=3,
                          name=f"down_blocks_{i}_resnets_{j}")(x)
            if i < n - 1:
                x = Downsample2D(ch,
                                 name=f"down_blocks_{i}_downsamplers_0")(x)
        return x  # [B, V, H/8, W/8, C_last]


class Upsample2D(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       name="conv")(x)


class Decoder2D(nn.Module):
    """conv_in + 4 UpBlock2D + norm/act/conv_out (64 -> 512 spatial).

    Each up block holds ``layers_per_block + 1`` resnets — the reference
    VAE_Decoder2D passes ``num_layers=layers_per_block + 1`` to UpBlock2D
    (vae_utils.py:1152) with the decoder-default layers_per_block=3, i.e.
    4 resnets per block.
    """

    out_channels: int
    block_channels: Sequence[int] = (256, 512, 512, 1024)  # forward order
    layers_per_block: int = 3
    remat_mode: str = "block"  # decoder resnets at 512^2 x1024ch OOM un-remat'd

    @nn.compact
    def __call__(self, z):  # [B, h, w, latent]
        block = _resnet_for(self.remat_mode)
        chans = list(reversed(self.block_channels))
        x = nn.Conv(chans[0], (3, 3), padding="SAME", name="conv_in")(z)
        n = len(chans)
        for i, ch in enumerate(chans):
            for j in range(self.layers_per_block + 1):
                x = block(ch, dims=2,
                          name=f"up_blocks_{i}_resnets_{j}")(x)
            if i < n - 1:
                x = Upsample2D(ch, name=f"up_blocks_{i}_upsamplers_0")(x)
        x = nn.GroupNorm(num_groups=_num_groups(x.shape[-1]), epsilon=1e-6,
                         name="norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       name="conv_out")(x)


def _sdpa(q, k, v, max_logit_elems: int = 1 << 25):
    """SDPA with EXACT query chunking for long sequences.

    XLA's dot_product_attention materializes the [B, h, Nq, Nk] logits (3GB
    f32 for the vae_b bottleneck cross-attention: 4096 queries x 24576
    encoder tokens x 8 heads) and saves them for backward. Softmax rows are
    independent, so chunking the QUERY axis is exact — each chunk's logits
    stay bounded and jax.checkpoint recomputes them in backward instead of
    saving. Layouts: q [B,Nq,h,d], k/v [B,Nk,h,d]."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    if nq * nk * h * b <= max_logit_elems:
        return jax.nn.dot_product_attention(q, k, v)
    c = max(1, max_logit_elems // (nk * h * b))
    c = 1 << (c.bit_length() - 1)
    while nq % c:
        c //= 2
    if c < 8:  # awkward shapes: fall back to one-shot
        return jax.nn.dot_product_attention(q, k, v)
    qs = jnp.moveaxis(q.reshape(b, nq // c, c, h, d), 1, 0)

    @jax.checkpoint
    def f(qc):
        return jax.nn.dot_product_attention(qc, k, v)

    out = jax.lax.map(f, qs)                       # [Nq/c, B, c, h, d]
    return jnp.moveaxis(out, 0, 1).reshape(b, nq, h, d)


class MHA(nn.Module):
    """diffusers-``Attention`` parity (the reference bottleneck attention).

    Structure of Attention(query_dim, heads, dim_head, qk_norm='layer_norm',
    norm_num_groups=32, ...) as used by VAE_CrossAttention /
    Conv_Atten_Block (vae_utils.py:1242-1314):

    * GroupNorm(32, query_dim) on the QUERY input before qkv (diffusers
      applies ``attn.group_norm`` inside the processor),
    * q/k/v projections to inner = heads * head_dim (512 for the reference's
      8 x 64 — NOT query_dim 1024), no bias,
    * per-head LayerNorm on q and k over head_dim (qk_norm='layer_norm'),
    * optional learned LayerNorm on the cross-attention context
      (cross_attention_norm='layer_norm', torch-default eps 1e-5),
    * out projection inner -> query_dim with bias, optional residual add of
      the RAW input (residual_connection=True saves it before group_norm).

    Submodule names mirror diffusers (to_q/to_k/to_v/to_out/norm_q/norm_k/
    group_norm/norm_cross) for checkpoint conversion. ``dropout`` matches
    diffusers' placement: after the out projection, before the residual add
    (the reference bottleneck trains with 0.1 — autoencoder.py:119);
    inactive unless called with ``deterministic=False``.
    """

    dim: int              # query dim
    heads: int
    head_dim: int = 64
    context_dim: Optional[int] = None
    norm_context: bool = False
    residual: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        inner = self.heads * self.head_dim
        ctx = x if context is None else context
        if self.norm_context and context is not None:
            ctx = nn.LayerNorm(epsilon=1e-5, name="norm_cross")(ctx)
        h = nn.GroupNorm(num_groups=_num_groups(self.dim), epsilon=1e-6,
                         name="group_norm")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q")(h)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)
        q = nn.LayerNorm(epsilon=1e-6, name="norm_q")(
            q.reshape(*q.shape[:-1], self.heads, -1)
        )
        k = nn.LayerNorm(epsilon=1e-6, name="norm_k")(
            k.reshape(*k.shape[:-1], self.heads, -1)
        )
        v = v.reshape(*v.shape[:-1], self.heads, -1)
        # LayerNorm promotes to f32; TPU SDPA wants uniform q/k/v dtypes
        out = _sdpa(q.astype(v.dtype), k.astype(v.dtype), v)
        out = out.reshape(*x.shape[:-1], inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        if self.dropout > 0.0:
            out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        if self.residual:
            out = out + x
        return out


class ConvAttenBlock(nn.Module):
    """Parallel conv + self-attention residual block on a token grid.

    x + SiLU(GN(conv2d(x_grid) + attn(x))) — Conv_Atten_Block
    (vae_utils.py:1242-1277).
    """

    height: int
    width: int
    dim: int
    heads: int
    head_dim: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # [B, H*W, D]
        b = x.shape[0]
        grid = x.reshape(b, self.height, self.width, self.dim)
        conv_out = nn.Conv(self.dim, (3, 3), padding="SAME",
                           name="conv")(grid)
        conv_out = conv_out.reshape(b, -1, self.dim)
        attn_out = MHA(dim=self.dim, heads=self.heads,
                       head_dim=self.head_dim, dropout=self.dropout,
                       name="attn")(x, deterministic=deterministic)
        out = conv_out + attn_out
        out = nn.GroupNorm(num_groups=_num_groups(self.dim), epsilon=1e-6,
                           name="norm")(out)
        out = nn.silu(out)
        return x + out


class DiagonalGaussian(NamedTuple):
    mean: jnp.ndarray     # [B, h, w, C]
    logvar: jnp.ndarray

    def sample(self, key):
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(key, self.mean.shape)

    def mode(self):
        return self.mean

    def kl(self):
        var = jnp.exp(self.logvar)
        return 0.5 * jnp.sum(
            self.mean ** 2 + var - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )

    def nll(self, sample):
        var = jnp.exp(self.logvar)
        return 0.5 * jnp.sum(
            math.log(2 * math.pi) + self.logvar + (sample - self.mean) ** 2 / var,
            axis=tuple(range(1, self.mean.ndim)),
        )


def sincos_table(n_pos: int, dim: int) -> np.ndarray:
    """Classic transformer sinusoid table [n_pos, dim]."""
    pos = np.arange(n_pos)[:, None]
    i = np.arange(dim)[None, :]
    angle = pos / np.power(10000.0, 2 * (i // 2) / dim)
    table = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
    return table.astype(np.float32)


class ConvVAE(nn.Module):
    """Encoder + UV-query bottleneck + decoder (Conv_VAE equivalent)."""

    cfg: Config

    def setup(self):
        c = self.cfg
        enc_mode, dec_mode = _stack_modes(c.remat_policy)
        self.encoder = Encoder3D(block_channels=c.encoder_channels,
                                 remat_mode=enc_mode,
                                 name="encoder")
        d = c.encoder_channels[-1]
        self.h = self.w = c.uv_query_size
        self.uv_latent = self.param(
            "uv_latent", nn.initializers.normal(1.0), (1, self.h * self.w, d)
        )
        # torch: uv_encoding = Sequential(Conv2d(3,d,8,8), GroupNorm, SiLU)
        self.uv_conv = nn.Conv(d, (8, 8), strides=(8, 8), padding="VALID",
                               name="uv_encoding_0")
        self.uv_norm = nn.GroupNorm(num_groups=_num_groups(d), epsilon=1e-6,
                                    name="uv_encoding_1")
        self.pos_embedding = jnp.asarray(sincos_table(self.h * self.w, d * 2))
        heads = c.vae_attention_heads
        hd = c.vae_attention_head_dim
        # the bottleneck attention stack is remat'd: at vae_b scale each
        # layer's saved activations (4096 tokens x 1024 ch + SDPA heads +
        # the dropout mask) cost ~40 MB of backward residuals, and the
        # recompute is ~0.2 ms/layer — the 7 layers together are what tips
        # the B=1 V=10 train graph over the 16 GB chip otherwise.
        # static_argnums count self: deterministic is arg 3 (MHA) / 2 (CAB).
        RMHA = nn.remat(MHA, static_argnums=(3,))
        RCAB = nn.remat(ConvAttenBlock, static_argnums=(2,))
        self.cross_attn = RMHA(dim=2 * d, heads=heads, head_dim=hd,
                               context_dim=d, norm_context=True,
                               residual=True, dropout=c.attn_dropout,
                               name="attention_cross_attn")
        self.middle = [
            RCAB(height=self.h, width=self.w, dim=2 * d,
                 heads=heads, head_dim=hd, dropout=c.attn_dropout,
                 name=f"attention_middle_layers_{i}")
            for i in range(c.self_attention_layers)
        ]
        self.projection = nn.Dense(2 * c.latent_channels, name="projection")
        self.decoder = Decoder2D(out_channels=c.vae_out_channels,
                                 block_channels=c.decoder_channels,
                                 remat_mode=dec_mode,
                                 name="decoder")

    def encode(self, x, initial_uv, train: bool = False) -> DiagonalGaussian:
        """x [B,V,H,W,9]; initial_uv [B,H,W,3] -> posterior over [B,h,w,Cl].

        ``train=True`` activates the bottleneck attention dropout
        (reference trains with 0.1 — autoencoder.py:119; needs a
        'dropout' rng in ``apply``)."""
        h = self.encoder(x)                               # [B,V,h,w,D]
        b = h.shape[0]
        d = h.shape[-1]
        tokens = h.reshape(b, -1, d)
        uv = self.uv_conv(initial_uv)
        uv = nn.silu(self.uv_norm(uv))                    # [B,h,w,D]
        # reference quirk (autoencoder.py:159): the uv tokens come from a
        # CHANNEL-MAJOR flatten — ``view(bs, -1, d)`` on the contiguous
        # NCHW conv output, NOT a per-pixel permute. Token t's features are
        # 512 consecutive scalars of the (c, h, w)-flat buffer. Replicated
        # bit-exactly so converted checkpoints see the layout they trained on.
        uv = jnp.moveaxis(uv, -1, 1).reshape(b, -1, d)
        query = jnp.concatenate(
            [jnp.broadcast_to(self.uv_latent, (b,) + self.uv_latent.shape[1:]),
             uv], axis=-1,
        )
        query = query + self.pos_embedding[None]
        # positional (not keyword) deterministic: nn.remat static_argnums
        attn = self.cross_attn(query, tokens, not train)
        for layer in self.middle:
            attn = layer(attn, not train)
        proj = self.projection(attn)                      # [B, h*w, 2Cl]
        proj = proj.reshape(b, self.h, self.w, -1)
        mean, logvar = jnp.split(proj, 2, axis=-1)
        return DiagonalGaussian(mean, jnp.clip(logvar, -30.0, 20.0))

    def decode(self, z):
        """z [B,h,w,Cl] -> UV feature map [B,H,W,out]."""
        return self.decoder(z)

    def __call__(self, x, initial_uv, rng, sample_posterior: bool = True,
                 train: bool = False):
        posterior = self.encode(x, initial_uv, train=train)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z), posterior


class GaussianHeads(nn.Module):
    """Split UV features into geo/rgb halves and decode Gaussian attribute maps.

    Returns the 13-channel attribute map [B,H,W,13] laid out as
    (opacity1, offset3, rgb3, scale3, rot3) *pre-grid-sample*, with the
    reference's activations applied (autoencoder.py:247-309).
    """

    @nn.compact
    def __call__(self, feats):  # [B,H,W,C]
        half = feats.shape[-1] // 2
        geo = nn.Conv(10, (3, 3), padding="SAME",
                      name="decode_gaussian_geo")(feats[..., :half])
        rgb = nn.Conv(3, (3, 3), padding="SAME",
                      name="decode_gaussian_rgb")(feats[..., half:])
        opacity = jax.nn.sigmoid(geo[..., 0:1])
        offset = geo[..., 1:4]
        scale = jax.nn.sigmoid(geo[..., 4:7])
        rot = jax.nn.sigmoid(geo[..., 7:10])
        rgb = jax.nn.sigmoid(rgb)
        return jnp.concatenate([opacity, offset, rgb, scale, rot], axis=-1)


SIGMOID_SATURATION = 0.001


def sample_gaussian_attrs(attr_map: jnp.ndarray, uv: jnp.ndarray):
    """Fetch per-Gaussian attributes from the UV attribute map.

    attr_map [B,H,W,13]; uv [N,2] in [0,1] (template init_uv). Matches the
    reference's grid_sample call: coords scaled to [-1,1], y flipped,
    bilinear, border padding, align_corners=False (autoencoder.py:297-302).
    Returns dict of [B,N,*] attribute arrays with post-sample activations.
    """
    coord = uv * 2.0 - 1.0
    coord = coord * jnp.array([1.0, -1.0])
    chw = jnp.moveaxis(attr_map, -1, 1)                  # [B,13,H,W]
    out = jax.vmap(lambda m: grid_sample_2d(m, coord, align_corners=False))(chw)
    out = jnp.moveaxis(out, 1, -1)                       # [B,N,13]
    opacity = out[..., 0:1]
    offset = out[..., 1:4]
    rgb = out[..., 4:7]
    scale = out[..., 7:10]
    rot = out[..., 10:13]
    rgb = rgb * (1 + SIGMOID_SATURATION * 2) - SIGMOID_SATURATION
    scale = (scale - 0.5) * 2.0
    rot = (rot - 0.5) * jnp.pi
    return {
        "opacity": opacity,
        "offset": offset,
        "rgb": rgb,
        "scale": scale,
        "rot": rot,
    }


def compose_rotations(rot_delta: jnp.ndarray, init_rot: jnp.ndarray,
                      tfs: jnp.ndarray) -> jnp.ndarray:
    """R_def = tfs[:3,:3] @ init_rot @ rodrigues(rot_delta).

    rot_delta [B,N,3] axis-angle; init_rot [N,3,3]; tfs [B,N,4,4].
    (autoencoder.py:333-337)
    """
    R_delta = rodrigues(rot_delta)                        # [B,N,3,3]
    R = jnp.einsum("nij,bnjk->bnik", init_rot, R_delta)
    return jnp.einsum("bnij,bnjk->bnik", tfs[..., :3, :3], R)


class VAEModel(nn.Module):
    """ConvVAE + Gaussian heads; geometry/deform/render handled functionally
    by the trainer (sigman_release_tpu/training) so the module stays a pure
    image->attributes map."""

    cfg: Config

    def setup(self):
        self.autoencoder = ConvVAE(self.cfg)
        self.heads = GaussianHeads()

    def __call__(self, images, initial_uv, rng, sample_posterior: bool = True,
                 train: bool = False):
        """images [B,V,9,H,W] (reference layout) -> (attr_map, posterior).

        ``sample_posterior=False`` decodes the posterior mode — used by eval
        so metrics are deterministic (reference eval decodes the mean).
        ``train=True`` enables bottleneck attention dropout (pass a
        'dropout' rng through ``apply``)."""
        x = jnp.moveaxis(images, 2, -1)                   # NHWC
        uv = jnp.moveaxis(initial_uv, 1, -1)
        feats, posterior = self.autoencoder(x, uv, rng, sample_posterior,
                                            train=train)
        return self.heads(feats), posterior

    def encode(self, images, initial_uv) -> DiagonalGaussian:
        x = jnp.moveaxis(images, 2, -1)
        uv = jnp.moveaxis(initial_uv, 1, -1)
        return self.autoencoder.encode(x, uv)

    def decode(self, z):
        """z [B,h,w,Cl] -> attribute map [B,H,W,13]."""
        return self.heads(self.autoencoder.decode(z))
