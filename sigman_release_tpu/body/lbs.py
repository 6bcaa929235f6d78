"""Linear blend skinning in JAX.

Functional counterpart of the reference's extended ``lbs`` fork, which returns
the LBS internals the deformer consumes — per-bone relative transforms A,
per-vertex transforms T, shape/pose offsets, and the flattened pose feature
(/root/reference/core/modules/deformers/smplx/lbs.py:152-248).

The kinematic chain (batch_rigid_transform, lbs.py:345-401 in the reference)
is unrolled at trace time over the static ``parents`` array — 55 joints of
4x4 matmuls; XLA fuses the chain into a handful of kernels.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.ops.rotations import rodrigues


class LBSOutput(NamedTuple):
    verts: jnp.ndarray          # [B,V,3]
    joints: jnp.ndarray         # [B,J,3] posed joints
    A: jnp.ndarray              # [B,J,4,4] relative bone transforms
    T: jnp.ndarray              # [B,V,4,4] per-vertex skinning transforms
    shape_offset: jnp.ndarray   # [B,V,3]
    pose_offset: jnp.ndarray    # [B,V,3]
    pose_feature: jnp.ndarray   # [B,(J-1)*9]


def blend_shapes(betas: jnp.ndarray, shape_dirs: jnp.ndarray) -> jnp.ndarray:
    """betas [B,S], shape_dirs [V,3,S] -> [B,V,3]."""
    return jnp.einsum("bs,vcs->bvc", betas, shape_dirs)


def vertices2joints(J_regressor: jnp.ndarray, verts: jnp.ndarray) -> jnp.ndarray:
    """J_regressor [J,V], verts [B,V,3] -> [B,J,3]."""
    return jnp.einsum("jv,bvc->bjc", J_regressor, verts)


def batch_rigid_transform(
    rot_mats: jnp.ndarray,       # [B,J,3,3]
    joints: jnp.ndarray,         # [B,J,3] rest joints
    parents: Sequence[int],      # static kinematic tree, parents[0] == -1
):
    """Forward kinematics. Returns (posed_joints [B,J,3], A [B,J,4,4])."""
    parents = np.asarray(parents)
    B, J = joints.shape[:2]
    rel = joints.at[:, 1:].add(-joints[:, parents[1:]])

    # local 4x4s
    top = jnp.concatenate([rot_mats, rel[..., None]], axis=-1)    # [B,J,3,4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], rot_mats.dtype), (B, J, 1, 4)
    )
    local = jnp.concatenate([top, bottom], axis=-2)               # [B,J,4,4]

    chain = [local[:, 0]]
    for j in range(1, J):
        chain.append(chain[parents[j]] @ local[:, j])
    world = jnp.stack(chain, axis=1)                              # [B,J,4,4]
    posed_joints = world[:, :, :3, 3]

    # A = world minus the rest-joint offset column (relative transforms)
    jh = jnp.concatenate([joints, jnp.zeros_like(joints[..., :1])], axis=-1)
    shift = jnp.einsum("bjik,bjk->bji", world, jh)                # [B,J,4]
    A = world.at[:, :, :, 3].add(-shift)
    return posed_joints, A


def lbs(
    betas: jnp.ndarray,          # [B,S]
    pose: jnp.ndarray,           # [B,J*3] axis-angle
    v_template: jnp.ndarray,     # [V,3]
    shapedirs: jnp.ndarray,      # [V,3,S]
    posedirs: jnp.ndarray,       # [P,V*3] with P = (J-1)*9
    J_regressor: jnp.ndarray,    # [J,V]
    parents: Sequence[int],
    lbs_weights: jnp.ndarray,    # [V,J]
) -> LBSOutput:
    B = pose.shape[0]
    J = J_regressor.shape[0]

    shape_offset = blend_shapes(betas, shapedirs)
    v_shaped = v_template[None] + shape_offset
    joints = vertices2joints(J_regressor, v_shaped)

    rot_mats = rodrigues(pose.reshape(B, J, 3))                   # [B,J,3,3]
    ident = jnp.eye(3, dtype=pose.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)       # [B,(J-1)*9]
    pose_offset = (pose_feature @ posedirs).reshape(B, -1, 3)

    v_posed = v_shaped + pose_offset
    posed_joints, A = batch_rigid_transform(rot_mats, joints, parents)

    T = jnp.einsum("vj,bjik->bvik", lbs_weights, A)               # [B,V,4,4]
    vh = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    verts = jnp.einsum("bvik,bvk->bvi", T, vh)[..., :3]
    return LBSOutput(verts, posed_joints, A, T, shape_offset, pose_offset,
                     pose_feature)


def skinning(
    pts: jnp.ndarray,        # [B,N,3]
    weights: jnp.ndarray,    # [B,N,J]
    tfs: jnp.ndarray,        # [B,J,4,4]
):
    """Weighted-transform skinning. Returns (posed [B,N,3], w_tf [B,N,4,4]).

    Equivalent of the reference's deformer ``skinning``
    (/root/reference/.../deformer_smplx.py:196-223).
    """
    w_tf = jnp.einsum("bnj,bjik->bnik", weights, tfs)
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    posed = jnp.einsum("bnik,bnk->bni", w_tf, ph)[..., :3]
    return posed, w_tf


def rigid_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of rigid 4x4 transforms [...,4,4]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ik,...k->...i", R_inv, t)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(R_inv)
    out = out.at[..., :3, 3].set(t_inv)
    out = out.at[..., 3, 3].set(1.0)
    return out
