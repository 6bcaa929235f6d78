#!/usr/bin/env python
"""Convert Sapiens ViT weights (torchscript .pt2 / state-dict .pth) into the
flax ViTFeatureEncoder.

The reference conditions its DiT on a frozen torchscript Sapiens-1B
(/root/reference/train_DiT.py:222-225); the weights are an external download
the reference doesn't ship either. This converter accepts either a
torchscript file (parameters extracted via torch.jit.load) or a plain
state-dict and maps the mmpretrain-style VisionTransformer layout
(patch_embed.projection, pos_embed, layers.{i}.ln1/attn.qkv/attn.proj/
ln2/ffn.layers.0.0/ffn.layers.1, final ln) onto
``models/encoders.py::sapiens_1b_encoder``. Name matching is regex-lenient
(arbitrary prefixes like 'backbone.'), and every unmatched source key is
reported — nothing drops silently.

    python scripts/convert_sapiens.py --ckpt sapiens_1b.pt2 --check
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# regexes against mmpretrain naming; group 1 (if any) is the layer index
RULES = [
    (r"patch_embed\.proj(?:ection)?\.weight$", "patch_kernel"),
    (r"patch_embed\.proj(?:ection)?\.bias$", "patch_bias"),
    (r"pos_embed$", "pos_embed"),
    (r"layers?\.(\d+)\.(?:ln|norm)1\.weight$", "ln1_scale"),
    (r"layers?\.(\d+)\.(?:ln|norm)1\.bias$", "ln1_bias"),
    (r"layers?\.(\d+)\.attn\.qkv\.weight$", "qkv_w"),
    (r"layers?\.(\d+)\.attn\.qkv\.bias$", "qkv_b"),
    (r"layers?\.(\d+)\.attn\.proj\.weight$", "proj_w"),
    (r"layers?\.(\d+)\.attn\.proj\.bias$", "proj_b"),
    (r"layers?\.(\d+)\.(?:ln|norm)2\.weight$", "ln2_scale"),
    (r"layers?\.(\d+)\.(?:ln|norm)2\.bias$", "ln2_bias"),
    (r"layers?\.(\d+)\.(?:ffn\.layers\.0\.0|mlp\.fc1)\.weight$", "ffn1_w"),
    (r"layers?\.(\d+)\.(?:ffn\.layers\.0\.0|mlp\.fc1)\.bias$", "ffn1_b"),
    (r"layers?\.(\d+)\.(?:ffn\.layers\.1|mlp\.fc2)\.weight$", "ffn2_w"),
    (r"layers?\.(\d+)\.(?:ffn\.layers\.1|mlp\.fc2)\.bias$", "ffn2_b"),
    (r"(?:^|\.)(?:ln1|norm|ln)\.weight$", "out_scale"),
    (r"(?:^|\.)(?:ln1|norm|ln)\.bias$", "out_bias"),
]


def load_source(path: str):
    import torch

    if path.endswith((".pt2", ".pt", ".ts")):
        try:
            mod = torch.jit.load(path, map_location="cpu")
            return {k: v.detach().numpy()
                    for k, v in mod.state_dict().items()}
        except RuntimeError:
            pass
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: (v.detach().numpy() if hasattr(v, "detach") else
                np.asarray(v)) for k, v in sd.items()}


def convert(sd: dict, params, heads: int, verbose: bool = True):
    """Returns (updated params, stats). ``params`` from
    sapiens_1b_encoder().init (or any matching ViTFeatureEncoder)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = dict(flatten_dict(params))
    hits, mismatches, matched_src = 0, [], set()

    def put(path, w):
        nonlocal hits
        if path not in flat:
            mismatches.append(f"no flax param {'/'.join(path)}")
            return
        if tuple(flat[path].shape) != tuple(w.shape):
            mismatches.append(
                f"{'/'.join(path)}: {w.shape} vs {flat[path].shape}")
            return
        flat[path] = w.astype(np.float32)
        hits += 1

    d = None
    for key, w in sd.items():
        for pat, kind in RULES:
            m = re.search(pat, key)
            if not m:
                continue
            matched_src.add(key)
            i = m.group(1) if m.groups() else None
            pp = ("params",)
            if kind == "patch_kernel":
                put(pp + ("patch_proj", "kernel"),
                    np.asarray(w).transpose(2, 3, 1, 0))
            elif kind == "patch_bias":
                put(pp + ("patch_proj", "bias"), np.asarray(w))
            elif kind == "pos_embed":
                w = np.asarray(w)
                if w.shape[1] == flat.get(
                        pp + ("pos_embed",), np.zeros((1, 0, 0))).shape[1] + 1:
                    w = w[:, 1:]  # drop cls token position
                put(pp + ("pos_embed",), w)
            elif kind == "qkv_w":
                w = np.asarray(w)                    # [3D, D]
                d = w.shape[1]
                hd = d // heads
                q, k, v = w.reshape(3, d, d)
                for name, t in (("query", q), ("key", k), ("value", v)):
                    put(pp + (f"blocks_{i}_attn", name, "kernel"),
                        t.T.reshape(d, heads, hd))
            elif kind == "qkv_b":
                w = np.asarray(w)
                d = w.shape[0] // 3
                hd = d // heads
                q, k, v = w.reshape(3, d)
                for name, t in (("query", q), ("key", k), ("value", v)):
                    put(pp + (f"blocks_{i}_attn", name, "bias"),
                        t.reshape(heads, hd))
            elif kind == "proj_w":
                w = np.asarray(w)                    # [D, D] out x in
                d = w.shape[0]
                hd = d // heads
                put(pp + (f"blocks_{i}_attn", "out", "kernel"),
                    w.T.reshape(heads, hd, d))
            elif kind == "proj_b":
                put(pp + (f"blocks_{i}_attn", "out", "bias"), np.asarray(w))
            elif kind in ("ln1_scale", "ln2_scale"):
                put(pp + (f"blocks_{i}_ln{kind[2]}", "scale"), np.asarray(w))
            elif kind in ("ln1_bias", "ln2_bias"):
                put(pp + (f"blocks_{i}_ln{kind[2]}", "bias"), np.asarray(w))
            elif kind == "ffn1_w":
                put(pp + (f"blocks_{i}_ffn1", "kernel"), np.asarray(w).T)
            elif kind == "ffn1_b":
                put(pp + (f"blocks_{i}_ffn1", "bias"), np.asarray(w))
            elif kind == "ffn2_w":
                put(pp + (f"blocks_{i}_ffn2", "kernel"), np.asarray(w).T)
            elif kind == "ffn2_b":
                put(pp + (f"blocks_{i}_ffn2", "bias"), np.asarray(w))
            elif kind == "out_scale":
                put(pp + ("norm_out", "scale"), np.asarray(w))
            elif kind == "out_bias":
                put(pp + ("norm_out", "bias"), np.asarray(w))
            break
    unmatched = sorted(k for k in sd if k not in matched_src)
    if verbose:
        print(f"[sapiens] {hits} converted, {len(mismatches)} mismatches, "
              f"{len(unmatched)} unmatched source keys")
        for s in mismatches[:20]:
            print("  mismatch:", s)
        for s in unmatched[:40]:
            print("  unmatched (DROPPED):", s)
    stats = {"hits": hits, "mismatches": mismatches, "unmatched": unmatched}
    return unflatten_dict(flat), stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sigman_release_tpu.models.encoders import sapiens_1b_encoder

    enc = sapiens_1b_encoder()
    params = jax.eval_shape(
        lambda k: enc.init(k, jnp.zeros((1, 3, 1024, 1024))),
        jax.random.PRNGKey(0),
    )
    # materialize only if writing (eval_shape keeps --check cheap)
    if not args.check:
        params = jax.jit(enc.init)(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 3, 1024, 1024)))
    sd = load_source(args.ckpt)
    converted, stats = convert(sd, params, heads=24)
    if args.check or not args.out:
        return
    from sigman_release_tpu.training.checkpoint import save_checkpoint

    save_checkpoint(args.out, converted)
    print(f"[sapiens] wrote {args.out}")


if __name__ == "__main__":
    main()
