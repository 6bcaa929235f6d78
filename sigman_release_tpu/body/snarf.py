"""Fast-SNARF inverse skinning: Broyden root-finding in canonical space.

TPU-native equivalents of the reference's three in-repo CUDA extensions
(SURVEY.md §2.2 N1-N3; /root/reference/core/modules/deformers/fast_snarf/cuda):

* ``precompute_voxel`` — blend per-voxel LBS weights with bone transforms
  into a position voxel ``voxel_d`` and Jacobian voxel ``voxel_J``
  (precompute_kernel.cu:25-71). A plain einsum: the MXU eats it.
* ``broyden_search`` — for each deformed point x_d and each of 11 bone
  inits, solve skin(x_c) = x_d by Broyden iterations with rank-1 J^-1
  updates (fuse_cuda_kernel.cu:319-488). The CUDA kernel already uses a
  fixed 10-iteration masked loop — exactly the shape TPUs want — so this is
  a vmapped ``lax.fori_loop`` over [N, I] with validity masking; XLA fuses
  the whole solve into one kernel (SURVEY.md §7 hard part 7).
* ``filter_duplicates`` — invalidate converged inits within 1e-4 of a
  later valid init (filter_kernel.cu:26-70): a pairwise O(I^2) mask.

Used by the SMPL inverse-deformation path; the shipped SMPL-X pipeline uses
forward skinning (body/deformer.py) instead.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from sigman_release_tpu.ops.grid_sample import grid_sample_3d

# the 11 canonical-init bones of fast-SNARF (deformer_smplx.py:28)
INIT_BONES = (0, 1, 2, 4, 5, 12, 15, 16, 17, 18, 19)
MAX_ITERS = 10
CONV_EPS = 1e-5
DIVERGE_DIST = 4.0
DUP_EPS = 1e-4


class SnarfVoxels(NamedTuple):
    voxel_d: jnp.ndarray    # [3, D, H, W] blended posed positions
    voxel_J: jnp.ndarray    # [9, D, H, W] blended rotation part (row-major)


def precompute_voxel(
    lbs_voxel: jnp.ndarray,   # [J, D, H, W] weights
    tfs: jnp.ndarray,         # [J, 4, 4] bone transforms
    grid_pts: jnp.ndarray,    # [D*H*W, 3] voxel centers (world)
) -> SnarfVoxels:
    """Per-voxel blended transform: d = (sum_j w_j T_j) x, J = sum_j w_j R_j."""
    J, D, H, W = lbs_voxel.shape
    w = lbs_voxel.reshape(J, -1)                       # [J, V]
    T_blend = jnp.einsum("jv,jik->vik", w, tfs)        # [V, 4, 4]
    ones = jnp.ones_like(grid_pts[:, :1])
    hom = jnp.concatenate([grid_pts, ones], axis=-1)
    posed = jnp.einsum("vik,vk->vi", T_blend, hom)[:, :3]
    voxel_d = posed.T.reshape(3, D, H, W)
    voxel_J = (
        T_blend[:, :3, :3].reshape(-1, 9).T.reshape(9, D, H, W)
    )
    return SnarfVoxels(voxel_d, voxel_J)


def _sample_voxels(voxels: SnarfVoxels, pts_norm: jnp.ndarray):
    """Trilinear lookup of (posed position, Jacobian) at normalized pts [N,3]."""
    d = grid_sample_3d(voxels.voxel_d, pts_norm, align_corners=True).T  # [N,3]
    Jm = grid_sample_3d(voxels.voxel_J, pts_norm, align_corners=True).T
    return d, Jm.reshape(-1, 3, 3)


@functools.partial(jax.jit, static_argnames=("normalize",))
def broyden_search(
    x_d: jnp.ndarray,        # [N, 3] deformed points
    voxels: SnarfVoxels,
    tfs: jnp.ndarray,        # [J, 4, 4] bone transforms
    offset: jnp.ndarray,     # [1, 1, 3] voxel normalization offset
    scale: jnp.ndarray,      # [] scale
    ratio: float = 4.0,
    normalize: bool = True,
):
    """Solve skin(x_c) = x_d from the INIT_BONES rigid guesses.

    Returns (x_c [N, I, 3], valid [N, I] bool).
    """
    N = x_d.shape[0]
    init_tfs = tfs[jnp.asarray(INIT_BONES)]            # [I,4,4]
    I = init_tfs.shape[0]

    def norm_fn(x):
        out = (x - offset.reshape(1, 3)) / scale
        return out.at[..., 2].multiply(ratio)

    # rigid init: x_c = T_b^-1 x_d for each init bone
    R = init_tfs[:, :3, :3]
    t = init_tfs[:, :3, 3]
    Rinv = jnp.swapaxes(R, -1, -2)
    xc0 = jnp.einsum("iab,nib->nia", Rinv, x_d[:, None] - t[None])  # [N,I,3]

    flat0 = xc0.reshape(N * I, 3)
    target = jnp.repeat(x_d, I, axis=0)                # [N*I,3]

    # initial residual + inverse-Jacobian estimate from the voxel field
    def residual(xc):
        posed, Jm = _sample_voxels(voxels, norm_fn(xc))
        return posed - target, Jm

    f0, J0 = residual(flat0)
    Jinv = jnp.linalg.inv(J0 + 1e-6 * jnp.eye(3))

    def body(_, state):
        xc, f, Jinv, ok = state
        dx = -jnp.einsum("nab,nb->na", Jinv, f)
        dx = jnp.where(ok[:, None], dx, 0.0)
        xc_new = xc + dx
        f_new, _ = residual(xc_new)
        df = f_new - f
        # rank-1 Broyden update of J^-1
        Jdf = jnp.einsum("nab,nb->na", Jinv, df)
        denom = jnp.sum(dx * Jdf, axis=-1, keepdims=True)
        corr = jnp.einsum(
            "na,nb->nab",
            (dx - Jdf) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12),
            jnp.einsum("na,nab->nb", dx, Jinv),
        )
        Jinv_new = Jinv + jnp.where(ok[:, None, None], corr, 0.0)
        still = jnp.linalg.norm(f_new, axis=-1) > CONV_EPS
        ok_new = ok & still
        return (
            jnp.where(ok[:, None], xc_new, xc),
            jnp.where(ok[:, None], f_new, f),
            Jinv_new,
            ok_new,
        )

    ok0 = jnp.ones((N * I,), bool)
    xc, f, _, _ = jax.lax.fori_loop(0, MAX_ITERS, body, (flat0, f0, Jinv, ok0))

    err = jnp.linalg.norm(f, axis=-1)
    dist = jnp.linalg.norm(xc - flat0, axis=-1)
    valid = (err < CONV_EPS * 10) & (dist < DIVERGE_DIST)
    return xc.reshape(N, I, 3), valid.reshape(N, I)


def filter_duplicates(x_c: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Keep one solution per cluster: drop init i if a valid init j > i lies
    within DUP_EPS (filter_kernel.cu semantics)."""
    d = jnp.linalg.norm(x_c[:, :, None] - x_c[:, None, :], axis=-1)  # [N,I,I]
    I = x_c.shape[1]
    later = jnp.triu(jnp.ones((I, I), bool), k=1)       # j > i
    dup = (d < DUP_EPS) & later[None] & valid[:, None, :]
    return valid & ~jnp.any(dup, axis=-1)


def inverse_skin_points(
    x_d: jnp.ndarray,
    lbs_voxel: jnp.ndarray,
    tfs: jnp.ndarray,
    grid_pts: jnp.ndarray,
    offset: jnp.ndarray,
    scale: jnp.ndarray,
    ratio: float = 4.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """End-to-end: precompute + search + filter. Returns (x_c [N,I,3], valid)."""
    voxels = precompute_voxel(lbs_voxel, tfs, grid_pts)
    x_c, valid = broyden_search(x_d, voxels, tfs, offset, scale, ratio)
    return x_c, filter_duplicates(x_c, valid)
