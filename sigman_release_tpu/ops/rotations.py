"""Rotation utilities (JAX, batched, differentiable).

Replaces the reference's torch helpers: batch_rodrigues
(/root/reference/core/modules/deformers/smplx/lbs.py:295-329 and
core/modules/autoencoder.py:455-486) and quaternion activation used by the
DiT Render head (/root/reference/core/modules/DiT_utils.py:832-881).
"""

from __future__ import annotations

import jax.numpy as jnp


def rodrigues(rot_vecs: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation matrices [..., 3, 3]."""
    angle = jnp.linalg.norm(rot_vecs + eps, axis=-1, keepdims=True)  # [...,1]
    axis = rot_vecs / angle
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(rot_vecs.shape[:-1] + (3, 3))
    eye = jnp.eye(3, dtype=rot_vecs.dtype)
    return eye + s * K + (1 - c) * (K @ K)


def quaternion_to_matrix(quat: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Quaternions [..., 4] (w, x, y, z) -> rotation matrices [..., 3, 3]."""
    if normalize:
        quat = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    m = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> quaternions [..., 4] (w, x, y, z).

    Branch-free (jnp.where) variant of the standard Shepperd method so it
    traces cleanly under jit/vmap.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    q0 = jnp.stack([safe_sqrt(1 + tr), m21 - m12, m02 - m20, m10 - m01], axis=-1)
    q1 = jnp.stack([m21 - m12, safe_sqrt(1 + m00 - m11 - m22), m01 + m10, m02 + m20], axis=-1)
    q2 = jnp.stack([m02 - m20, m01 + m10, safe_sqrt(1 - m00 + m11 - m22), m12 + m21], axis=-1)
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, safe_sqrt(1 - m00 - m11 + m22)], axis=-1)

    cond0 = tr > 0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    # normalize each selected candidate: each qi has ||qi|| = 2 * |component|,
    # generic normalization covers all branches.
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
