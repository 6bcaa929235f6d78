"""LBS Gaussian deformer (fast-SNARF-style forward skinning) in JAX.

Re-design of the reference's ``SMPLXDeformer`` + SMPL-X ``ForwardDeformer``
(/root/reference/core/modules/deformers/smplx_deformer.py:11-288,
fast_snarf/lib/model/deformer_smplx.py:35-117) as pure functions over an
explicit ``DeformerState`` pytree:

* init: canonical T-pose forward -> inverse bone transforms ``tfs_inv_t``;
  55-channel LBS-weight voxel (16 x 64 x 64) baked by 10-NN inverse-distance
  interpolation of the body model's skinning weights (TPU: brute-force KNN on
  the MXU, ops/knn.py),
* per batch: SMPL-X forward -> ``tfs = A @ tfs_inv_t``; per-face shape/pose
  offsets from template spdir/podir,
* per point: trilinear voxel query for weights, masked override with template
  weights (face/hands), un-pose from canonical, subtract canonical pose
  offset, add shape+pose offsets, re-skin with ``tfs``; returns posed points
  and the composite per-point transform ``w_tf @ w_tf_inv`` used to rotate
  Gaussian frames.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.body.lbs import rigid_inverse, skinning
from sigman_release_tpu.body.smplx import (
    SMPLXModel,
    SMPLXParams,
    canonical_params,
    smplx_forward,
)
from sigman_release_tpu.ops.grid_sample import grid_sample_3d
from sigman_release_tpu.ops.knn import knn

GLOBAL_SCALE = 1.2
VOXEL_RES = 64        # (d, h, w) = (res/4, res, res)


class DeformerState(NamedTuple):
    """Pose-independent buffers baked once from the canonical pose.

    Also carries the HEAVY constant tensors (body model + template
    shape/pose dirs + template skinning weights) so the whole deformation
    path can receive them as jit ARGUMENTS: closed-over arrays embed as HLO
    constants, and at real-template scale (~100k gaussians) the podir
    matrix alone is ~600 MB — past this environment's remote-compile
    request limit (HTTP 413) and needless executable bloat anywhere."""

    tfs_inv_t: jnp.ndarray       # [1,J,4,4] inverse canonical bone transforms
    vs_template: jnp.ndarray     # [1,V,3] canonical verts
    pose_offset_cano: jnp.ndarray  # [1,N,3] canonical per-face pose offset
    lbs_voxel: jnp.ndarray       # [J,D,H,W] weight voxel
    offset: jnp.ndarray          # [1,1,3] normalization offset
    scale: jnp.ndarray           # [] normalization scale
    ratio: float                 # H/D anisotropy
    model: SMPLXModel            # body model arrays (pytree)
    init_spdir: jnp.ndarray      # [M,3,20] per-vertex shape dirs
    init_podir: jnp.ndarray      # [486, M*3] per-vertex pose dirs
    init_lbsw: jnp.ndarray       # [N,J] template skinning weights


class PosedState(NamedTuple):
    """Per-batch pose-dependent quantities (prepare_deformer output)."""

    tfs_A: jnp.ndarray           # [B,J,4,4] bone transforms of the target pose
    shape_offset: jnp.ndarray    # [B,N,3] per-face
    pose_offset: jnp.ndarray     # [B,N,3] per-face


def _face_average(values: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Average per-vertex values over each face's 3 vertices.

    values [B,V,3], faces [F,3] -> [B,F,3]. Matches the reference's
    cat+mean over the three vertex gathers (smplx_deformer.py:247-288).
    """
    return (values[:, faces[:, 0]] + values[:, faces[:, 1]]
            + values[:, faces[:, 2]]) / 3.0


class GaussianDeformer:
    """Stateless orchestrator; all state lives in explicit pytrees."""

    def __init__(self, model: SMPLXModel, init_faces: np.ndarray,
                 init_spdir: jnp.ndarray, init_podir: jnp.ndarray,
                 init_lbsw: jnp.ndarray, weight_mask: Optional[np.ndarray]):
        """
        init_faces: [N,3] template face vertex ids (subdivided mesh)
        init_spdir: [N,3,20] per-face shape dirs (betas+expr)
        init_podir: [486, N*3] per-face pose dirs
        init_lbsw:  [N,J] per-face template skinning weights
        weight_mask: [N] bool — points whose voxel weights are overridden
        """
        self.model = model
        self.init_faces = np.asarray(init_faces)
        self.init_spdir = init_spdir        # per subdivided-mesh VERTEX
        self.init_podir = init_podir        # per subdivided-mesh vertex (*3)
        self.init_lbsw = init_lbsw          # per face-center point
        self.weight_mask = (
            np.asarray(weight_mask) if weight_mask is not None else None
        )

    # ---- one-time init ------------------------------------------------------

    def _model(self, state: DeformerState) -> SMPLXModel:
        """state.model with the STRUCTURAL fields re-attached.

        parents/faces index the kinematic chain at trace time (python-level
        loops), so they ride on the static ``self`` instead of the traced
        state pytree (where they are None)."""
        return state.model._replace(parents=self.model.parents,
                                    faces=self.model.faces)

    def initialize(self, model: Optional[SMPLXModel] = None,
                   init_spdir=None, init_podir=None,
                   init_lbsw=None) -> DeformerState:
        """Bake the pose-independent state.

        The heavy tensors may be passed as ARGUMENTS (so a jitted call
        ships them as device buffers, not HLO constants — mandatory at
        ~100k-gaussian template scale); they default to the constructor's
        copies for small models."""
        if model is None:
            model = self.model
        else:
            model = model._replace(parents=self.model.parents,
                                   faces=self.model.faces)
        init_podir = self.init_podir if init_podir is None else init_podir
        init_spdir = self.init_spdir if init_spdir is None else init_spdir
        init_lbsw = self.init_lbsw if init_lbsw is None else init_lbsw
        cano = canonical_params(1, pca_hands=True)
        out = smplx_forward(model, cano)
        tfs_inv_t = rigid_inverse(out.A)

        # canonical per-vertex pose offset, averaged to face centers
        pose_off = (out.pose_feature @ init_podir).reshape(1, -1, 3)
        pose_off = _face_average(pose_off, self.init_faces)

        d, h, w = VOXEL_RES // 4, VOXEL_RES, VOXEL_RES
        verts = out.verts[0]
        lo = jnp.min(verts, axis=0)
        hi = jnp.max(verts, axis=0)
        offset = ((lo + hi) * 0.5)[None, None]
        scale = jnp.max(hi - lo) / 2.0 * GLOBAL_SCALE
        ratio = h / d

        # voxel centers in world space (normalized z compressed by ratio)
        zs = jnp.linspace(-1, 1, d)
        ys = jnp.linspace(-1, 1, h)
        xs = jnp.linspace(-1, 1, w)
        gz, gy, gx = jnp.meshgrid(zs, ys, xs, indexing="ij")
        grid = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        denorm = grid.at[:, 2].divide(ratio) * scale + offset[0]

        d2, idx = knn(denorm, verts, k=10)
        dist = jnp.clip(jnp.sqrt(d2), 3e-5, 0.1)
        wts = 1.0 / dist
        wts = wts / jnp.sum(wts, axis=-1, keepdims=True)
        wv = jnp.sum(
            wts[..., None] * model.lbs_weights[idx], axis=1
        )                                               # [D*H*W, J]
        lbs_voxel = wv.T.reshape(-1, d, h, w)           # [J,D,H,W]

        return DeformerState(
            tfs_inv_t=tfs_inv_t,
            vs_template=out.verts,
            pose_offset_cano=pose_off,
            lbs_voxel=lbs_voxel,
            offset=offset,
            scale=scale,
            ratio=float(ratio),
            model=model._replace(parents=None, faces=None),
            init_spdir=jnp.asarray(init_spdir),
            init_podir=jnp.asarray(init_podir),
            init_lbsw=jnp.asarray(init_lbsw),
        )

    # ---- per-batch pose prep ------------------------------------------------

    def prepare(self, state: DeformerState, params: SMPLXParams) -> PosedState:
        out = smplx_forward(self._model(state), params)
        shape_comps = jnp.concatenate([params.betas, params.expression], -1)
        shape_offset = jnp.einsum("bl,mkl->bmk", shape_comps,
                                  state.init_spdir)
        pose_offset = (out.pose_feature @ state.init_podir).reshape(
            shape_offset.shape
        )
        return PosedState(out.A, shape_offset, pose_offset)

    # ---- per-point deformation ----------------------------------------------

    def query_weights(self, state: DeformerState, pts: jnp.ndarray):
        """Trilinear LBS-weight lookup. pts [B,N,3] -> [B,N,J]."""
        norm = (pts - state.offset) / state.scale
        norm = norm.at[..., 2].multiply(state.ratio)
        w = jax.vmap(
            lambda p: grid_sample_3d(state.lbs_voxel, p, align_corners=True)
        )(norm)                                          # [B,J,N]
        return jnp.swapaxes(w, 1, 2)

    def __call__(
        self,
        state: DeformerState,
        posed: PosedState,
        pts: jnp.ndarray,            # [B,N,3] canonical points (face centers)
    ):
        """Canonical -> posed. Returns (pts_posed [B,N,3], tfs [B,N,4,4])."""
        B = pts.shape[0]
        faces = self.init_faces

        w = self.query_weights(state, pts)
        if self.weight_mask is not None:
            mask = jnp.asarray(self.weight_mask)
            w = jnp.where(mask[None, :, None], state.init_lbsw[None], w)

        shape_off = _face_average(posed.shape_offset, faces)
        pose_off = _face_average(posed.pose_offset, faces)

        tfs_inv = jnp.broadcast_to(
            state.tfs_inv_t, (B,) + state.tfs_inv_t.shape[1:]
        )
        # un-pose from the canonical pose, strip its pose offset, apply the
        # target shape/pose offsets, then skin with the target bones
        x_cano, w_tf_inv = skinning(pts, w, tfs_inv)
        x_cano = x_cano - state.pose_offset_cano
        x_shaped = x_cano + shape_off + pose_off
        xd, w_tf = skinning(x_shaped, w, posed.tfs_A)
        tf_all = w_tf @ w_tf_inv
        return xd, tf_all
