"""Structural validation of the reference-checkpoint converter mapping."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import jax
import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.config import PRESETS
from sigman_release_tpu.models.dit import DiTModel

from convert_reference_ckpt import convert_dit, dit_key_map

CFG = PRESETS["test_tiny"].replace(
    num_layers=2, num_attention_heads=2, attention_head_dim=8,
    text_embed_dim=16, time_embed_dim=16, sample_height=8, sample_width=8,
)


def _init_params():
    model = DiTModel(CFG)
    latent = jnp.zeros((1, CFG.in_channels, CFG.sample_height,
                        CFG.sample_width))
    cond = jnp.zeros((1, CFG.text_embed_dim, 16, 16))
    return model.init(jax.random.PRNGKey(0), latent, cond,
                      jnp.zeros((1,), jnp.int32))


def test_mapping_paths_exist():
    """Every flax path in the converter table must exist in a fresh model."""
    from flax.traverse_util import flatten_dict

    params = _init_params()
    flat = set(flatten_dict(params).keys())
    missing = [
        "/".join(fpath)
        for _t, (fpath, _f) in dit_key_map(CFG.num_layers).items()
        if fpath not in flat
    ]
    assert not missing, f"converter maps to nonexistent params: {missing[:10]}"


def test_convert_roundtrip_identity():
    """A synthetic torch state_dict built FROM the flax params converts back
    exactly (validates every transform's transposition rules)."""
    from flax.traverse_util import flatten_dict

    params = _init_params()
    flat = flatten_dict(params)
    sd = {}
    for tname, (fpath, tfm) in dit_key_map(CFG.num_layers).items():
        w = np.asarray(flat[fpath])
        if tfm.__name__ == "_t_linear":
            sd[tname] = w.T
        elif tfm.__name__ == "_t_conv":
            sd[tname] = w.transpose(3, 2, 0, 1)
        else:
            sd[tname] = w
    converted = convert_dit(sd, params, CFG.num_layers, verbose=False)
    cflat = flatten_dict(converted)
    for k, v in flat.items():
        np.testing.assert_array_equal(np.asarray(cflat[k]), np.asarray(v))


# ---------------------------------------------------------------------------
# VAE converter (autoencoder.safetensors layout)
# ---------------------------------------------------------------------------

from convert_reference_ckpt import convert_vae, vae_key_map  # noqa: E402

VCFG = PRESETS["test_tiny"]


def _init_vae_params():
    from sigman_release_tpu.models.vae import VAEModel

    model = VAEModel(VCFG)
    H, V = VCFG.input_size, VCFG.num_input_views
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "sample": key},
                        jnp.zeros((1, V, 9, H, H)), jnp.zeros((1, 3, H, H)),
                        key)
    return model, params


def _vae_map():
    return vae_key_map(VCFG.encoder_channels, VCFG.decoder_channels,
                       enc_layers=2, dec_layers=3,
                       self_attention_layers=VCFG.self_attention_layers)


def test_vae_mapping_full_coverage():
    """The map must target every flax param AND no nonexistent ones — a
    checkpoint converted with it leaves nothing at initialization."""
    from flax.traverse_util import flatten_dict

    _, params = _init_vae_params()
    flat = set(flatten_dict(params).keys())
    targets = {fpath for _t, (fpath, _f) in _vae_map().items()}
    ghost = sorted("/".join(p) for p in targets - flat)
    uncovered = sorted("/".join(p) for p in flat - targets)
    assert not ghost, f"maps to nonexistent params: {ghost[:10]}"
    assert not uncovered, f"params not covered by the map: {uncovered[:10]}"


def test_vae_convert_roundtrip_identity():
    from flax.traverse_util import flatten_dict

    _, params = _init_vae_params()
    flat = flatten_dict(params)
    inv = {"_t_linear": lambda w: w.T,
           "_t_conv": lambda w: w.transpose(3, 2, 0, 1),
           "_t_conv3d": lambda w: w.transpose(4, 3, 0, 1, 2)}
    sd = {}
    for tname, (fpath, tfm) in _vae_map().items():
        w = np.asarray(flat[fpath])
        sd[tname] = inv.get(tfm.__name__, lambda x: x)(w)
    converted = convert_vae(sd, params, VCFG, verbose=False)
    cflat = flatten_dict(converted)
    for k, v in flat.items():
        np.testing.assert_array_equal(np.asarray(cflat[k]), np.asarray(v))


def _torch_vae_replica(cfg):
    """Plain-torch replica of the reference Conv_VAE + heads, with state-dict
    key names matching autoencoder.safetensors (the converter's source
    format). Mirrors /root/reference/core/modules/vae_utils.py semantics:
    resnets norm1>silu>conv1>norm2>silu>conv2 (+1x1 shortcut), per-frame
    stride-2 downsample with (0,1) pad, nearest 2x upsample, and diffusers
    Attention (group_norm on query, qk layer_norm per head,
    inner = heads*dim_head, to_out with bias)."""
    import math as _m

    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF

    def gcd32(ch):
        return _m.gcd(32, ch)

    class TRes(tnn.Module):
        def __init__(self, cin, cout, conv):
            super().__init__()
            self.norm1 = tnn.GroupNorm(gcd32(cin), cin, eps=1e-6)
            self.conv1 = conv(cin, cout, 3, padding=1)
            self.norm2 = tnn.GroupNorm(gcd32(cout), cout, eps=1e-6)
            self.conv2 = conv(cout, cout, 3, padding=1)
            if cin != cout:
                self.conv_shortcut = conv(cin, cout, 1)

        def forward(self, x):
            h = self.conv1(tF.silu(self.norm1(x)))
            h = self.conv2(tF.silu(self.norm2(h)))
            if hasattr(self, "conv_shortcut"):
                x = self.conv_shortcut(x)
            return x + h

    class TDown(tnn.Module):  # Downsample3D: per-frame 2D conv, (0,1) pad
        def __init__(self, ch):
            super().__init__()
            self.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=0)

        def forward(self, x):  # [B,C,V,H,W]
            x = tF.pad(x, (0, 1, 0, 1))
            b, c, v, h, w = x.shape
            x = x.permute(0, 2, 1, 3, 4).reshape(b * v, c, h, w)
            x = self.conv(x)
            return x.reshape(b, v, x.shape[1], x.shape[2], x.shape[3]) \
                    .permute(0, 2, 1, 3, 4)

    class TUp(tnn.Module):
        def __init__(self, ch):
            super().__init__()
            self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

        def forward(self, x):
            return self.conv(tF.interpolate(x, scale_factor=2.0))

    class TBlock(tnn.Module):
        def __init__(self, resnets, sampler, down):
            super().__init__()
            self.resnets = tnn.ModuleList(resnets)
            if sampler is not None:
                name = "downsamplers" if down else "upsamplers"
                setattr(self, name, tnn.ModuleList([sampler]))

        def forward(self, x):
            for r in self.resnets:
                x = r(x)
            for s in (getattr(self, "downsamplers",
                              getattr(self, "upsamplers", None)) or []):
                x = s(x)
            return x

    class TAttn(tnn.Module):
        def __init__(self, q_dim, heads, hd, ctx_dim=None, cross_norm=False,
                     residual=False):
            super().__init__()
            inner = heads * hd
            self.heads, self.hd, self.residual = heads, hd, residual
            self.group_norm = tnn.GroupNorm(gcd32(q_dim), q_dim, eps=1e-6)
            self.to_q = tnn.Linear(q_dim, inner, bias=False)
            self.to_k = tnn.Linear(ctx_dim or q_dim, inner, bias=False)
            self.to_v = tnn.Linear(ctx_dim or q_dim, inner, bias=False)
            self.norm_q = tnn.LayerNorm(hd, eps=1e-6)
            self.norm_k = tnn.LayerNorm(hd, eps=1e-6)
            if cross_norm:
                self.norm_cross = tnn.LayerNorm(ctx_dim)
            self.to_out = tnn.ModuleList([tnn.Linear(inner, q_dim)])

        def forward(self, x, ctx=None):
            res = x
            c = x if ctx is None else (
                self.norm_cross(ctx) if hasattr(self, "norm_cross") else ctx
            )
            h = self.group_norm(x.transpose(1, 2)).transpose(1, 2)
            b, n, _ = x.shape
            q = self.to_q(h).view(b, -1, self.heads, self.hd).transpose(1, 2)
            k = self.to_k(c).view(b, -1, self.heads, self.hd).transpose(1, 2)
            v = self.to_v(c).view(b, -1, self.heads, self.hd).transpose(1, 2)
            q, k = self.norm_q(q), self.norm_k(k)
            o = tF.scaled_dot_product_attention(q, k, v)
            o = o.transpose(1, 2).reshape(b, n, -1)
            o = self.to_out[0](o)
            return o + res if self.residual else o

    class TConvAtten(tnn.Module):
        def __init__(self, hw, dim, heads, hd):
            super().__init__()
            self.hw = hw
            self.conv = tnn.Conv2d(dim, dim, 3, padding=1)
            self.norm = tnn.GroupNorm(gcd32(dim), dim, eps=1e-6)
            self.attn = TAttn(dim, heads, hd)

        def forward(self, x):  # [B, N, D]
            b = x.shape[0]
            g = x.view(b, self.hw, self.hw, -1).permute(0, 3, 1, 2)
            co = self.conv(g).permute(0, 2, 3, 1).reshape(b, x.shape[1], -1)
            out = co + self.attn(x)
            out = self.norm(out.permute(0, 2, 1)).permute(0, 2, 1)
            return x + tF.silu(out)

    class TCrossAttention(tnn.Module):
        def __init__(self, hw, q_dim, ctx_dim, heads, hd, layers):
            super().__init__()
            self.cross_attn = TAttn(q_dim, heads, hd, ctx_dim=ctx_dim,
                                    cross_norm=True, residual=True)
            self.middle_layers = tnn.ModuleList(
                [TConvAtten(hw, q_dim, heads, hd) for _ in range(layers)]
            )

        def forward(self, q, ctx):
            x = self.cross_attn(q, ctx)
            for m in self.middle_layers:
                x = m(x)
            return x

    class TEncoder(tnn.Module):
        def __init__(self, chans, layers):
            super().__init__()
            self.conv_in = tnn.Conv3d(9, chans[0], 3, padding=1)
            blocks = []
            prev = chans[0]
            for i, ch in enumerate(chans):
                res = [TRes(prev if j == 0 else ch, ch, tnn.Conv3d)
                       for j in range(layers)]
                samp = TDown(ch) if i < len(chans) - 1 else None
                blocks.append(TBlock(res, samp, down=True))
                prev = ch
            self.down_blocks = tnn.ModuleList(blocks)

        def forward(self, x):
            x = self.conv_in(x)
            for b in self.down_blocks:
                x = b(x)
            return x

    class TDecoder(tnn.Module):
        def __init__(self, chans, out_ch, layers):
            super().__init__()
            rev = list(reversed(chans))
            self.conv_in = tnn.Conv2d(VCFG.latent_channels, rev[0], 3,
                                      padding=1)
            blocks = []
            prev = rev[0]
            for i, ch in enumerate(rev):
                res = [TRes(prev if j == 0 else ch, ch, tnn.Conv2d)
                       for j in range(layers + 1)]
                samp = TUp(ch) if i < len(rev) - 1 else None
                blocks.append(TBlock(res, samp, down=False))
                prev = ch
            self.up_blocks = tnn.ModuleList(blocks)
            self.norm_out = tnn.GroupNorm(gcd32(rev[-1]), rev[-1], eps=1e-6)
            self.conv_out = tnn.Conv2d(rev[-1], out_ch, 3, padding=1)

        def forward(self, z):
            x = self.conv_in(z)
            for b in self.up_blocks:
                x = b(x)
            return self.conv_out(tF.silu(self.norm_out(x)))

    class TConvVAE(tnn.Module):
        def __init__(self):
            super().__init__()
            c = cfg
            d = c.encoder_channels[-1]
            hw = c.uv_query_size
            self.encoder = TEncoder(c.encoder_channels, 2)
            self.uv_latent = tnn.Parameter(torch.randn(1, hw * hw, d))
            self.uv_encoding = tnn.Sequential(
                tnn.Conv2d(3, d, 8, stride=8),
                tnn.GroupNorm(gcd32(d), d, eps=1e-6), tnn.SiLU(),
            )
            from sigman_release_tpu.models.vae import sincos_table

            self.register_buffer(
                "pos_embedding",
                torch.as_tensor(sincos_table(hw * hw, d * 2))[None],
            )
            self.attention = TCrossAttention(
                hw, 2 * d, d, c.vae_attention_heads, c.vae_attention_head_dim,
                c.self_attention_layers,
            )
            self.projection = tnn.Linear(2 * d, 2 * c.latent_channels)
            self.decoder = TDecoder(c.decoder_channels, c.vae_out_channels, 3)
            self.hw = hw

        def encode_mean(self, x, uv):  # x [B,9,V,H,W]; uv [B,3,H,W]
            h = self.encoder(x)
            b, ch = h.shape[0], h.shape[1]
            tokens = h.permute(0, 2, 3, 4, 1).reshape(b, -1, ch)
            ue = self.uv_encoding(uv).reshape(
                b, -1, self.uv_latent.shape[-1]
            )  # channel-major view — the reference quirk
            q = torch.cat([self.uv_latent.repeat(b, 1, 1), ue], dim=-1)
            att = self.attention(q + self.pos_embedding, tokens)
            proj = self.projection(att)
            proj = proj.permute(0, 2, 1).view(b, -1, self.hw, self.hw)
            return proj.chunk(2, dim=1)[0]

    class TVAE(tnn.Module):
        def __init__(self):
            super().__init__()
            self.autoencoder = TConvVAE()
            half = cfg.vae_out_channels // 2
            self.decode_gaussian_geo = tnn.Conv2d(half, 10, 3, padding=1)
            self.decode_gaussian_rgb = tnn.Conv2d(half, 3, 3, padding=1)

    return TVAE()


def test_vae_convert_torch_oracle():
    """Numerical parity: a torch replica of the reference architecture and
    our flax model with CONVERTED weights must produce the same posterior
    mean and the same decoded UV features."""
    import torch

    from sigman_release_tpu.models.vae import VAEModel

    torch.manual_seed(0)
    tm = _torch_vae_replica(VCFG).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    model, params = _init_vae_params()
    converted = convert_vae(sd, params, VCFG, verbose=False)

    H, V = VCFG.input_size, VCFG.num_input_views
    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, V, 9, H, H)).astype(np.float32)
    uv = rng.standard_normal((1, 3, H, H)).astype(np.float32)

    with torch.no_grad():
        tx = torch.as_tensor(images).permute(0, 2, 1, 3, 4)  # [B,9,V,H,W]
        t_mean = tm.autoencoder.encode_mean(tx, torch.as_tensor(uv)).numpy()

    post = model.apply(converted, jnp.asarray(images), jnp.asarray(uv),
                       method=VAEModel.encode)
    j_mean = np.moveaxis(np.asarray(post.mean), -1, 1)       # [B,C,h,w]
    np.testing.assert_allclose(j_mean, t_mean, atol=2e-4, rtol=1e-3)

    # decode path + heads
    z = rng.standard_normal(t_mean.shape).astype(np.float32)
    with torch.no_grad():
        feats = tm.autoencoder.decoder(torch.as_tensor(z))
        half = VCFG.vae_out_channels // 2
        t_geo = tm.decode_gaussian_geo(feats[:, :half]).numpy()
    attr = model.apply(converted, jnp.asarray(np.moveaxis(z, 1, -1)),
                       method=VAEModel.decode)
    # attr layout: (opacity, offset, rgb, scale, rot) with activations;
    # compare the raw-est shared quantity: sigmoid(geo[...,0]) == opacity
    t_opacity = 1.0 / (1.0 + np.exp(-t_geo[:, 0]))
    j_opacity = np.asarray(attr[..., 0])
    np.testing.assert_allclose(j_opacity, t_opacity, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Discriminator converter (discriminator.safetensors layout)
# ---------------------------------------------------------------------------

from convert_reference_ckpt import (  # noqa: E402
    convert_disc, disc_key_map,
)
from sigman_release_tpu.convert import disc_expected_unmapped  # noqa: E402
from sigman_release_tpu.losses.gan import PatchDiscriminator  # noqa: E402

DISC_LAYERS = 3  # small for test speed; the reference trains n_layers=4


def _init_disc_params(n_layers=DISC_LAYERS, ndf=16):
    disc = PatchDiscriminator(ndf=ndf, n_layers=n_layers)
    return disc, disc.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 1, 3, 64, 64)))


def _torch_disc_replica(n_layers=DISC_LAYERS, ndf=16):
    """NLayerDiscriminator2D replica with matching state-dict names
    (/root/reference/core/loss/discriminator.py:74-127: kw=3, first/last
    conv with bias, BatchNorm blocks without)."""
    import torch.nn as tnn

    seq = [tnn.Conv2d(3, ndf, 3, stride=2, padding=1), tnn.LeakyReLU(0.2)]
    mult = 1
    for i in range(1, n_layers):
        prev, mult = mult, min(2 ** i, 8)
        seq += [tnn.Conv2d(ndf * prev, ndf * mult, 3, stride=2, padding=1,
                           bias=False),
                tnn.BatchNorm2d(ndf * mult), tnn.LeakyReLU(0.2)]
    prev, mult = mult, min(2 ** n_layers, 8)
    seq += [tnn.Conv2d(ndf * prev, ndf * mult, 3, stride=1, padding=1,
                       bias=False),
            tnn.BatchNorm2d(ndf * mult), tnn.LeakyReLU(0.2),
            tnn.Conv2d(ndf * mult, 1, 3, padding=1)]
    return tnn.Sequential(*[m for m in seq])


def test_disc_mapping_full_coverage():
    from flax.traverse_util import flatten_dict

    _, params = _init_disc_params()
    flat = set(flatten_dict(params).keys())
    targets = {fpath for _t, (fpath, _f) in disc_key_map(DISC_LAYERS).items()}
    ghost = sorted("/".join(p) for p in targets - flat)
    uncovered = sorted("/".join(p) for p in flat - targets)
    assert not ghost, f"maps to nonexistent params: {ghost}"
    assert not uncovered, f"params not covered: {uncovered}"


def test_disc_torch_keys_all_mapped():
    """Every key a real reference-shaped torch checkpoint contains is either
    mapped or an expected-unmapped BatchNorm statistic."""
    import torch

    torch.manual_seed(0)
    tm = _torch_disc_replica()
    sd = {f"main.{k}": v for k, v in tm.state_dict().items()}
    km = disc_key_map(DISC_LAYERS)
    expected = set(disc_expected_unmapped(DISC_LAYERS))
    stray = sorted(k for k in sd if k not in km and k not in expected)
    assert not stray, f"unmapped torch keys: {stray}"
    # and the conversion itself: all conv/affine weights land, right shapes
    _, params = _init_disc_params()
    converted = convert_disc(sd, params, DISC_LAYERS, verbose=False)
    from flax.traverse_util import flatten_dict

    cflat = flatten_dict(converted)
    for tname, (fpath, tfm) in km.items():
        np.testing.assert_allclose(
            np.asarray(cflat[fpath]), tfm(sd[tname].numpy()), atol=0
        )


def test_disc_conv_stack_matches_torch():
    """With normalization bypassed (identity BN running stats / GN disabled
    is impossible — instead compare the FIRST conv+lrelu stage, which has no
    norm), the converted flax disc matches torch exactly."""
    import torch
    import torch.nn.functional as tF

    torch.manual_seed(1)
    tm = _torch_disc_replica()
    sd = {f"main.{k}": v for k, v in tm.state_dict().items()}
    disc, params = _init_disc_params()
    converted = convert_disc(sd, params, DISC_LAYERS, verbose=False)

    x = np.random.default_rng(0).standard_normal((2, 3, 32, 32)).astype(
        np.float32)
    with torch.no_grad():
        t_out = tF.leaky_relu(tm[0](torch.as_tensor(x)), 0.2).numpy()

    import flax.linen as fnn

    class FirstStage(fnn.Module):
        @fnn.compact
        def __call__(self, images):
            h = jnp.moveaxis(images, 1, -1)
            h = fnn.Conv(16, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)), name="Conv_0")(h)
            return fnn.leaky_relu(h, 0.2)

    first_params = {"params": {"Conv_0": converted["params"]["Conv_0"]}}
    j_out = FirstStage().apply(first_params, jnp.asarray(x))
    np.testing.assert_allclose(np.moveaxis(np.asarray(j_out), -1, 1), t_out,
                               atol=1e-5, rtol=1e-5)
