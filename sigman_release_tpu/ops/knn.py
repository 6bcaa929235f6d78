"""K-nearest-neighbour utilities (JAX, TPU-friendly).

Replaces two CUDA dependencies of the reference:
* ``simple_knn.distCUDA2`` — mean squared distance to the 3 nearest
  neighbours, used (detached) as the per-Gaussian base scale
  (/root/reference/core/gaussians/gs.py:70-72),
* ``pytorch3d.ops.knn_points`` — K=10 neighbours for LBS-weight voxel baking
  (/root/reference/.../deformer_smplx.py:255-277), init-time only.

Design: brute-force tiled distance matmuls. ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b
puts the O(N*M) work on the MXU; top-k over the candidate axis. For the point
counts in this workload (N ~ 1e5, voxel 16*64*64 = 65k) a blocked brute force
runs at memory-bandwidth speed on TPU and needs no hashing machinery.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn(query: jnp.ndarray, points: jnp.ndarray, k: int = 10, block: int = 4096):
    """For each query row return (dist2, idx) of the k nearest ``points``.

    query [Q,3], points [N,3] -> dist2 [Q,k], idx [Q,k].
    Blocked over queries so the [block, N] distance tile stays on-chip.
    """
    Q = query.shape[0]
    pad = (-Q) % block
    qpad = jnp.pad(query, ((0, pad), (0, 0)))
    p2 = jnp.sum(points * points, axis=-1)  # [N]

    def one_block(qb):
        d2 = (
            jnp.sum(qb * qb, axis=-1, keepdims=True)
            - 2.0 * qb @ points.T
            + p2[None, :]
        )  # [block, N]
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    qb = qpad.reshape(-1, block, 3)
    d2, idx = jax.lax.map(one_block, qb)
    d2 = d2.reshape(-1, k)[:Q]
    idx = idx.reshape(-1, k)[:Q]
    return jnp.maximum(d2, 0.0), idx


@functools.partial(jax.jit, static_argnames=("block",))
def mean_knn_dist2(points: jnp.ndarray, block: int = 4096) -> jnp.ndarray:
    """Mean squared distance to the 3 nearest neighbours (excluding self).

    points [N,3] -> [N]. Equivalent of ``simple_knn.distCUDA2``.
    """
    d2, _ = _self_knn4(points, block)
    # first column is the point itself (distance ~0) — use columns 1..3
    return jnp.mean(d2[:, 1:4], axis=-1)


def _self_knn4(points, block):
    N = points.shape[0]
    pad = (-N) % block
    ppad = jnp.pad(points, ((0, pad), (0, 0)))
    p2 = jnp.sum(points * points, axis=-1)

    def one_block(qb):
        d2 = (
            jnp.sum(qb * qb, axis=-1, keepdims=True)
            - 2.0 * qb @ points.T
            + p2[None, :]
        )
        neg, idx = jax.lax.top_k(-d2, 4)
        return -neg, idx

    qb = ppad.reshape(-1, block, 3)
    d2, idx = jax.lax.map(one_block, qb)
    return (
        jnp.maximum(d2.reshape(-1, 4)[:N], 0.0),
        idx.reshape(-1, 4)[:N],
    )
