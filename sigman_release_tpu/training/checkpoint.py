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


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Returns the raw state dict (indexed-dict form)."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


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
