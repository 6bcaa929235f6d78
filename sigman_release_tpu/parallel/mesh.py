"""Device mesh + sharding helpers (the distributed runtime).

Replaces the reference's accelerate/NCCL DDP stack
(/root/reference/configs/training.yaml, train_vae.py:29-32,122-124) the
TPU-native way: one process per host, a global ``jax.sharding.Mesh`` over all
pod-slice devices, batch-sharded jit so gradient ``psum`` rides ICI and XLA's
async collectives overlap the all-reduce with backward — no hand-written
communication.

Default topology is pure data-parallel (mesh ``('data',)``) matching the
reference's 8x8 DDP; the mesh helper accepts extra axes (e.g.
``('data', 'model')``) for TP-style shardings of the DiT if scaled up.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host init over DCN (jax.distributed). Safe no-op when single."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(shape: Sequence[int] = (-1,),
              axes: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh over all devices; -1 infers the free axis size."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    want = int(np.prod(shape))
    assert want <= n, (shape, n)
    return Mesh(devices.reshape(-1)[:want].reshape(shape), tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# batch keys whose second dim is the RENDER-VIEW axis — shardable over a
# 'view' mesh axis (rays/tiles across chips, the BASELINE north star: each
# shard rasterizes its views of every sample against replicated Gaussians;
# photometric losses decompose over views, so grads pmean over both axes)
VIEW_SHARDED_KEYS = (
    "cam_view", "cam_view_proj", "cam_pos", "images_output", "masks_output",
)


def batch_spec(key: str, mesh: Mesh, axis: str = "data") -> P:
    """PartitionSpec for one batch entry under this mesh topology."""
    if "view" in mesh.axis_names and key in VIEW_SHARDED_KEYS:
        return P(axis, "view")
    return P(axis)


def batch_specs(batch, mesh: Mesh, axis: str = "data"):
    """Per-key PartitionSpec dict matching the batch pytree."""
    return {k: batch_spec(k, mesh, axis) for k in batch}


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a host batch (dict pytree), batch dim sharded over ``axis``
    and (when the mesh has a 'view' axis) render views over 'view'.

    Non-array entries (e.g. item ids) are dropped.
    """
    def put(k, x):
        sh = NamedSharding(mesh, batch_spec(k, mesh, axis))
        return jax.device_put(np.asarray(x), sh)

    return {
        k: put(k, v) for k, v in batch.items()
        if isinstance(v, (np.ndarray, jax.Array))
    }


def prefetch_to_device(iterable, mesh: Mesh, axis: str = "data",
                       size: int = 2):
    """Iterate device-resident batches, device_put'ing ``size`` ahead.

    jax.device_put is asynchronous, so enqueuing the NEXT batch's H2D copy
    before yielding the current one overlaps the transfer with the step's
    compute — the TPU analogue of the reference DataLoader's pinned-memory
    prefetch."""
    import collections
    import itertools

    q: "collections.deque" = collections.deque()
    it = iter(iterable)
    for b in itertools.islice(it, size):
        q.append(shard_batch(b, mesh, axis))
    while q:
        out = q.popleft()
        for b in itertools.islice(it, 1):
            q.append(shard_batch(b, mesh, axis))
        yield out
