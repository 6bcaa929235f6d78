#!/usr/bin/env python
"""Convert reference (torch safetensors) checkpoints into flax param trees.

Covers the reference's DiT checkpoint layout
(/root/reference/core/modules/DiT.py DiT3DModel, saved per
train_DiT.py:459-467) -> sigman_release_tpu.models.dit.DiTModel params, with
the standard torch->flax weight transforms (Linear [out,in] -> kernel
[in,out]; Conv OIHW -> HWIO). Restoration is shape-tolerant: unmatched or
mismatched entries keep their initialization and are reported, mirroring the
reference's tolerant loads (train_DiT.py:245-264).

The reference repo ships no weights, so this converter is validated
structurally (name coverage against a freshly-initialized model) — run with
``--check`` to print the mapping report for a given file.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def convert_dit(sd: dict, params, n_layers: int, verbose=True):
    """Apply the mapping into a freshly-initialized flax params tree."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = {tuple(k.split("/")) if isinstance(k, str) else k: v
            for k, v in flatten_dict(params).items()}
    key_map = dit_key_map(n_layers)
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
    # source keys the map doesn't know about would otherwise be dropped
    # silently (e.g. biases from configs the map predates) — always surface
    unmapped = sorted(k for k in sd if k not in key_map)
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
    return unflatten_dict(flat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="torch safetensors file")
    ap.add_argument("--preset", default="dit")
    ap.add_argument("--out", default=None, help="msgpack output path")
    ap.add_argument("--check", action="store_true",
                    help="report mapping coverage only")
    args = ap.parse_args()

    from safetensors.numpy import load_file

    import jax
    import jax.numpy as jnp

    from sigman_release_tpu.config import PRESETS
    from sigman_release_tpu.models.dit import DiTModel

    sd = load_file(args.ckpt)
    cfg = PRESETS[args.preset]
    model = DiTModel(cfg)
    latent = jnp.zeros((1, cfg.in_channels, cfg.sample_height,
                        cfg.sample_width))
    cond = jnp.zeros((1, cfg.text_embed_dim, 16, 16))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), latent, cond,
                                 jnp.zeros((1,), jnp.int32))
    converted = convert_dit(sd, params, cfg.num_layers)
    if args.check or not args.out:
        return
    from sigman_release_tpu.training.checkpoint import save_checkpoint

    save_checkpoint(args.out, converted)
    print(f"[convert] wrote {args.out}")


if __name__ == "__main__":
    main()
