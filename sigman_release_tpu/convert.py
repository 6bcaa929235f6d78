"""Reference (torch safetensors) checkpoint -> flax param-tree conversion.

Covers the reference's DiT checkpoint layout
(/root/reference/core/modules/DiT.py DiT3DModel, saved per
train_DiT.py:459-467), the VAE layout (core/modules/autoencoder.py:201-250,
saved per train_vae.py:216-228 and loaded by Load_VAE,
DiT_utils.py:773-830) and the NLayerDiscriminator2D layout
(core/loss/discriminator.py:74-127, saved per train_vae.py:216-228), with
the standard torch->flax weight transforms (Linear [out,in] -> kernel
[in,out]; Conv OIHW -> HWIO). Restoration is shape-tolerant: unmatched or
mismatched entries keep their initialization and are reported, mirroring the
reference's tolerant loads (train_DiT.py:245-264).

The reference repo ships no weights, so the mapping is validated
structurally (name coverage against freshly-initialized models and a
randomly-initialized torch replica oracle — tests/test_convert.py).
"""

from __future__ import annotations

import numpy as np

def _t_linear(w):
    return np.asarray(w).T


def _t_conv(w):
    # torch OIHW -> flax HWIO
    return np.asarray(w).transpose(2, 3, 1, 0)


def dit_key_map(n_layers: int):
    """torch state_dict name -> (flax path tuple, transform)."""
    m = {
        "patch_embed.proj.weight": (("params", "patch_embed", "proj", "kernel"), _t_conv),
        "patch_embed.proj.bias": (("params", "patch_embed", "proj", "bias"), np.asarray),
        "patch_embed.cond_proj.weight": (("params", "patch_embed", "cond_proj", "kernel"), _t_conv),
        "patch_embed.cond_proj.bias": (("params", "patch_embed", "cond_proj", "bias"), np.asarray),
        "time_embedding.linear_1.weight": (("params", "time_emb_1", "kernel"), _t_linear),
        "time_embedding.linear_1.bias": (("params", "time_emb_1", "bias"), np.asarray),
        "time_embedding.linear_2.weight": (("params", "time_emb_2", "kernel"), _t_linear),
        "time_embedding.linear_2.bias": (("params", "time_emb_2", "bias"), np.asarray),
        "norm_final.weight": (("params", "norm_final", "scale"), np.asarray),
        "norm_final.bias": (("params", "norm_final", "bias"), np.asarray),
        "norm_out.linear.weight": (("params", "norm_out_proj", "kernel"), _t_linear),
        "norm_out.linear.bias": (("params", "norm_out_proj", "bias"), np.asarray),
        "norm_out.norm.weight": (("params", "norm_out", "scale"), np.asarray),
        "norm_out.norm.bias": (("params", "norm_out", "bias"), np.asarray),
        "proj_out.weight": (("params", "proj_out", "kernel"), _t_linear),
        "proj_out.bias": (("params", "proj_out", "bias"), np.asarray),
    }
    for i in range(n_layers):
        t = f"transformer_blocks.{i}"
        f = f"block_{i}"
        m.update({
            f"{t}.norm1.linear.weight": (("params", f, "norm1", "Dense_0", "kernel"), _t_linear),
            f"{t}.norm1.linear.bias": (("params", f, "norm1", "Dense_0", "bias"), np.asarray),
            f"{t}.norm1.norm.weight": (("params", f, "norm1", "LayerNorm_0", "scale"), np.asarray),
            f"{t}.norm1.norm.bias": (("params", f, "norm1", "LayerNorm_0", "bias"), np.asarray),
            f"{t}.norm2.linear.weight": (("params", f, "norm2", "Dense_0", "kernel"), _t_linear),
            f"{t}.norm2.linear.bias": (("params", f, "norm2", "Dense_0", "bias"), np.asarray),
            f"{t}.norm2.norm.weight": (("params", f, "norm2", "LayerNorm_0", "scale"), np.asarray),
            f"{t}.norm2.norm.bias": (("params", f, "norm2", "LayerNorm_0", "bias"), np.asarray),
            f"{t}.attn1.to_q.weight": (("params", f, "attn1", "to_q", "kernel"), _t_linear),
            f"{t}.attn1.to_k.weight": (("params", f, "attn1", "to_k", "kernel"), _t_linear),
            f"{t}.attn1.to_v.weight": (("params", f, "attn1", "to_v", "kernel"), _t_linear),
            # reference DiT3DModel defaults attention_bias=True (DiT.py:232)
            f"{t}.attn1.to_q.bias": (("params", f, "attn1", "to_q", "bias"), np.asarray),
            f"{t}.attn1.to_k.bias": (("params", f, "attn1", "to_k", "bias"), np.asarray),
            f"{t}.attn1.to_v.bias": (("params", f, "attn1", "to_v", "bias"), np.asarray),
            f"{t}.attn1.norm_q.weight": (("params", f, "attn1", "norm_q", "scale"), np.asarray),
            f"{t}.attn1.norm_k.weight": (("params", f, "attn1", "norm_k", "scale"), np.asarray),
            f"{t}.attn1.to_out.0.weight": (("params", f, "attn1", "to_out", "kernel"), _t_linear),
            f"{t}.attn1.to_out.0.bias": (("params", f, "attn1", "to_out", "bias"), np.asarray),
            f"{t}.ff.net.0.proj.weight": (("params", f, "ff", "Dense_0", "kernel"), _t_linear),
            f"{t}.ff.net.0.proj.bias": (("params", f, "ff", "Dense_0", "bias"), np.asarray),
            f"{t}.ff.net.2.weight": (("params", f, "ff", "Dense_1", "kernel"), _t_linear),
            f"{t}.ff.net.2.bias": (("params", f, "ff", "Dense_1", "bias"), np.asarray),
        })
    return m


def _t_conv3d(w):
    # torch OIDHW -> flax DHWIO
    return np.asarray(w).transpose(2, 3, 4, 1, 0)


def vae_key_map(enc_channels=(128, 256, 256, 512),
                dec_channels=(256, 512, 512, 1024),
                enc_layers=2, dec_layers=3, self_attention_layers=6):
    """torch VAE state_dict (autoencoder.safetensors — the reference ``VAE``
    module incl. Conv_VAE, /root/reference/core/modules/autoencoder.py:201-250,
    saved per train_vae.py:216-228 and loaded by Load_VAE,
    DiT_utils.py:773-830) -> flax VAEModel paths."""
    m = {}

    def conv2(t, f):
        m[f"{t}.weight"] = (f + ("kernel",), _t_conv)
        m[f"{t}.bias"] = (f + ("bias",), np.asarray)

    def conv3(t, f):
        m[f"{t}.weight"] = (f + ("kernel",), _t_conv3d)
        m[f"{t}.bias"] = (f + ("bias",), np.asarray)

    def norm(t, f):  # GroupNorm / LayerNorm: weight -> scale
        m[f"{t}.weight"] = (f + ("scale",), np.asarray)
        m[f"{t}.bias"] = (f + ("bias",), np.asarray)

    def lin(t, f, bias=True):
        m[f"{t}.weight"] = (f + ("kernel",), _t_linear)
        if bias:
            m[f"{t}.bias"] = (f + ("bias",), np.asarray)

    def resnet(t, f, conv, in_ch, out_ch):
        norm(f"{t}.norm1", f + ("norm1",))
        conv(f"{t}.conv1", f + ("conv1",))
        norm(f"{t}.norm2", f + ("norm2",))
        conv(f"{t}.conv2", f + ("conv2",))
        if in_ch != out_ch:
            conv(f"{t}.conv_shortcut", f + ("conv_shortcut",))

    def attention(t, f, cross=False):
        """diffusers Attention as configured by VAE_CrossAttention /
        Conv_Atten_Block (vae_utils.py:1284-1307): group_norm on query,
        qk layer_norm, inner = heads*dim_head, out projection with bias."""
        norm(f"{t}.group_norm", f + ("group_norm",))
        lin(f"{t}.to_q", f + ("to_q",), bias=False)
        lin(f"{t}.to_k", f + ("to_k",), bias=False)
        lin(f"{t}.to_v", f + ("to_v",), bias=False)
        norm(f"{t}.norm_q", f + ("norm_q",))
        norm(f"{t}.norm_k", f + ("norm_k",))
        lin(f"{t}.to_out.0", f + ("to_out",))
        if cross:
            norm(f"{t}.norm_cross", f + ("norm_cross",))

    ae = ("params", "autoencoder")

    # ---- encoder (VAE_Encoder3D_atten: conv_in + 4 DownBlock3D) ----------
    enc = ae + ("encoder",)
    conv3("autoencoder.encoder.conv_in", enc + ("conv_in",))
    prev = enc_channels[0]
    for i, ch in enumerate(enc_channels):
        for j in range(enc_layers):
            in_ch = prev if j == 0 else ch
            resnet(f"autoencoder.encoder.down_blocks.{i}.resnets.{j}",
                   enc + (f"down_blocks_{i}_resnets_{j}",), conv3, in_ch, ch)
        if i < len(enc_channels) - 1:
            conv2(f"autoencoder.encoder.down_blocks.{i}.downsamplers.0.conv",
                  enc + (f"down_blocks_{i}_downsamplers_0", "conv"))
        prev = ch

    # ---- UV-query bottleneck ---------------------------------------------
    m["autoencoder.uv_latent"] = (ae + ("uv_latent",), np.asarray)
    conv2("autoencoder.uv_encoding.0", ae + ("uv_encoding_0",))
    norm("autoencoder.uv_encoding.1", ae + ("uv_encoding_1",))
    attention("autoencoder.attention.cross_attn",
              ae + ("attention_cross_attn",), cross=True)
    for i in range(self_attention_layers):
        t = f"autoencoder.attention.middle_layers.{i}"
        f = ae + (f"attention_middle_layers_{i}",)
        conv2(f"{t}.conv", f + ("conv",))
        norm(f"{t}.norm", f + ("norm",))
        attention(f"{t}.attn", f + ("attn",))
    lin("autoencoder.projection", ae + ("projection",))

    # ---- decoder (VAE_Decoder2D: conv_in + 4 UpBlock2D of dec_layers+1) --
    dec = ae + ("decoder",)
    chans = list(reversed(dec_channels))
    conv2("autoencoder.decoder.conv_in", dec + ("conv_in",))
    prev = chans[0]
    for i, ch in enumerate(chans):
        for j in range(dec_layers + 1):
            in_ch = prev if j == 0 else ch
            resnet(f"autoencoder.decoder.up_blocks.{i}.resnets.{j}",
                   dec + (f"up_blocks_{i}_resnets_{j}",), conv2, in_ch, ch)
        if i < len(chans) - 1:
            conv2(f"autoencoder.decoder.up_blocks.{i}.upsamplers.0.conv",
                  dec + (f"up_blocks_{i}_upsamplers_0", "conv"))
        prev = ch
    norm("autoencoder.decoder.norm_out", dec + ("norm_out",))
    conv2("autoencoder.decoder.conv_out", dec + ("conv_out",))

    # ---- gaussian heads (on the VAE wrapper, autoencoder.py:246-248) -----
    conv2("decode_gaussian_geo", ("params", "heads", "decode_gaussian_geo"))
    conv2("decode_gaussian_rgb", ("params", "heads", "decode_gaussian_rgb"))
    return m


# non-parameter buffers present in the torch state dict by design: the
# sincos table is recomputed, the template uv coords load from npy assets
VAE_EXPECTED_UNMAPPED = ("autoencoder.pos_embedding", "smplx_uvcoord")


def apply_key_map(sd: dict, params, key_map, expected_unmapped=(),
                  verbose=True):
    """Apply a mapping into a freshly-initialized flax params tree."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = {tuple(k.split("/")) if isinstance(k, str) else k: v
            for k, v in flatten_dict(params).items()}
    hits, misses, mismatches = 0, [], []
    for tname, (fpath, tfm) in key_map.items():
        if tname not in sd:
            misses.append(tname)
            continue
        w = tfm(sd[tname])
        if fpath not in flat:
            misses.append(f"{tname} -> {'/'.join(fpath)} (no such flax param)")
            continue
        if tuple(w.shape) != tuple(flat[fpath].shape):
            mismatches.append(
                f"{tname}: {w.shape} vs {flat[fpath].shape}"
            )
            continue
        flat[fpath] = w
        hits += 1
    unmapped = sorted(k for k in sd
                      if k not in key_map and k not in expected_unmapped)
    if verbose:
        print(f"[convert] {hits} converted, {len(misses)} missing, "
              f"{len(mismatches)} shape mismatches, "
              f"{len(unmapped)} unmapped source keys")
        for s in misses[:20]:
            print("  missing:", s)
        for s in mismatches[:20]:
            print("  mismatch:", s)
        for s in unmapped[:40]:
            print("  unmapped (DROPPED):", s)
    stats = {"hits": hits, "misses": misses, "mismatches": mismatches,
             "unmapped": unmapped}
    return unflatten_dict(flat), stats


def convert_vae(sd: dict, params, cfg, verbose=True):
    km = vae_key_map(cfg.encoder_channels, cfg.decoder_channels,
                     enc_layers=2, dec_layers=3,
                     self_attention_layers=cfg.self_attention_layers)
    tree, _ = apply_key_map(sd, params, km, VAE_EXPECTED_UNMAPPED, verbose)
    return tree


def convert_dit(sd: dict, params, n_layers: int, verbose=True):
    tree, _ = apply_key_map(sd, params, dit_key_map(n_layers),
                            verbose=verbose)
    return tree


def disc_key_map(n_layers: int = 4):
    """NLayerDiscriminator2D ``discriminator.safetensors``
    (/root/reference/core/loss/discriminator.py:74-127, saved per
    train_vae.py:224-228) -> flax :class:`PatchDiscriminator` paths.

    The torch ``main`` Sequential indexes as conv0+lrelu, then
    (conv, BatchNorm, lrelu) triples, then the final 1-channel conv; the
    flax module names its convs/norms in call order. BatchNorm affine
    params map onto GroupNorm scale/bias — the running statistics have no
    GroupNorm counterpart and are expected-unmapped (a resumed reference
    GAN re-estimates normalization from group stats; see losses/gan.py).
    """
    m = {}

    def conv(ti, fname, bias):
        m[f"main.{ti}.weight"] = (("params", fname, "kernel"), _t_conv)
        if bias:
            m[f"main.{ti}.bias"] = (("params", fname, "bias"), np.asarray)

    def bn(ti, gi):
        f = ("params", f"GroupNorm_{gi}")
        m[f"main.{ti}.weight"] = (f + ("scale",), np.asarray)
        m[f"main.{ti}.bias"] = (f + ("bias",), np.asarray)

    conv(0, "Conv_0", bias=True)
    for b in range(n_layers - 1):                   # stride-2 blocks
        conv(2 + 3 * b, f"Conv_{b + 1}", bias=False)
        bn(3 + 3 * b, b)
    conv(2 + 3 * (n_layers - 1), f"Conv_{n_layers}", bias=False)
    bn(3 + 3 * (n_layers - 1), n_layers - 1)        # stride-1 block
    conv(2 + 3 * n_layers, f"Conv_{n_layers + 1}", bias=True)
    return m


def disc_expected_unmapped(n_layers: int = 4):
    """BatchNorm running stats present in the torch file by design."""
    out = []
    for b in range(n_layers):
        ti = 3 + 3 * b
        out += [f"main.{ti}.running_mean", f"main.{ti}.running_var",
                f"main.{ti}.num_batches_tracked"]
    return tuple(out)


def convert_disc(sd: dict, params, n_layers: int = 4, verbose=True):
    tree, _ = apply_key_map(sd, params, disc_key_map(n_layers),
                            disc_expected_unmapped(n_layers), verbose)
    return tree


