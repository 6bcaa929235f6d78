"""Checkpointing: full train state (params + optimizer + step + RNG).

Improves on the reference, which safetensors-saves weights only and loses
optimizer state/step/RNG on resume (/root/reference/train_vae.py:216-228,
SURVEY.md §5). Serialization is flax msgpack; ``tolerant_restore`` reproduces
the reference's shape-tolerant load semantics (copy matching-shape entries,
warn otherwise — train_vae.py:59-75).

Multi-host: only process 0 writes; all hosts read. Arrays are gathered to
host before writing (fine at these model sizes; orbax-style sharded
checkpointing can be layered in when models outgrow host memory).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict


def save_checkpoint(path: str, state: Any) -> None:
    """state: arbitrary pytree (params, opt_state tuples, step, ...).

    Converted through flax ``to_state_dict`` so tuples/NamedTuples (optax
    states) serialize as indexed dicts.
    """
    sd = serialization.to_state_dict(state)

    def to_host(x):
        if not hasattr(x, "shape"):
            return x
        # multi-host sharded leaves (fsdp / view meshes) aren't addressable
        # from one process — gather them; every process must participate
        if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True)
            )
        return np.asarray(x)

    host_state = jax.tree.map(to_host, sd)
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.msgpack_serialize(host_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def sniff_format(path: str) -> str:
    """``"safetensors"`` or ``"msgpack"`` from the file's first bytes.

    A safetensors file opens with a u64-LE JSON-header length followed by
    ``{`` (the reference's torch checkpoints, train_vae.py:216-228); flax
    msgpack never does (a msgpack map head byte is never preceded by 8
    length bytes ending in ``{`` at offset 8).
    """
    with open(path, "rb") as f:
        head = f.read(9)
    if len(head) == 9 and head[8:9] == b"{":
        n = int.from_bytes(head[:8], "little")
        if 2 <= n <= os.path.getsize(path):
            return "safetensors"
    return "msgpack"


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Returns the raw state dict (indexed-dict form)."""
    if sniff_format(path) == "safetensors":
        raise ValueError(
            f"{path} is a torch safetensors checkpoint, not a flax msgpack "
            "one — load it with load_params_any(path, target_params, cfg) "
            "or convert it first via scripts/convert_reference_ckpt.py"
        )
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_params_any(path: str, target_params: Any, cfg: Any,
                    verbose: bool = True) -> Any:
    """Load model params from EITHER format into ``target_params``'s tree.

    * flax msgpack (ours): tolerant restore of the ``params`` subtree (or
      the whole tree when the file holds bare params);
    * torch safetensors (the reference's ``autoencoder.safetensors`` /
      ``transformer.safetensors`` / ``discriminator.safetensors``): routed
      through :mod:`sigman_release_tpu.convert` with the model family
      sniffed from the key names — the reference's Load_VAE flow
      (/root/reference/core/modules/DiT_utils.py:773-830) as one call.
    """
    if sniff_format(path) == "safetensors":
        from safetensors.numpy import load_file

        from sigman_release_tpu import convert as _convert

        sd = load_file(path)
        if any(k.startswith("autoencoder.") for k in sd):
            return _convert.convert_vae(sd, target_params, cfg,
                                        verbose=verbose)
        if any(k.startswith("main.") for k in sd):
            return _convert.convert_disc(sd, target_params, verbose=verbose)
        return _convert.convert_dit(sd, target_params, cfg.num_layers,
                                    verbose=verbose)
    loaded = load_checkpoint(path)
    if isinstance(loaded, dict) and "params" in loaded:
        loaded = loaded["params"]
    # bare params trees were saved from the {'params': ...} level: peel the
    # target to match if needed
    tgt = target_params
    if (isinstance(tgt, dict) and "params" in tgt
            and not (isinstance(loaded, dict) and "params" in loaded)):
        return {**tgt, "params": tolerant_restore(tgt["params"], loaded)}
    return tolerant_restore(tgt, loaded)


def tolerant_restore(target: Any, loaded: Dict[str, Any],
                     verbose: bool = True) -> Any:
    """Copy entries whose shapes match into ``target``'s structure; keep
    target values otherwise. Returns a pytree with target's structure."""
    tgt_sd = serialization.to_state_dict(target)
    # keep_empty_nodes: optax chain states contain EmptyState() == {} whose
    # keys must survive the flatten/unflatten roundtrip
    tgt_flat = flatten_dict(tgt_sd, keep_empty_nodes=True)
    src_flat = flatten_dict(loaded, keep_empty_nodes=True)
    out = {}
    for k, v in tgt_flat.items():
        if k in src_flat and getattr(src_flat[k], "shape", None) == getattr(
            v, "shape", None
        ):
            out[k] = src_flat[k]
        else:
            if verbose and k in src_flat:
                print(f"[ckpt] shape mismatch for {'/'.join(map(str, k))}: "
                      f"{getattr(src_flat[k], 'shape', '?')} vs "
                      f"{getattr(v, 'shape', '?')} — keeping init")
            elif verbose:
                print(f"[ckpt] missing key {'/'.join(map(str, k))} — keeping init")
            out[k] = v
    return serialization.from_state_dict(target, unflatten_dict(out))
