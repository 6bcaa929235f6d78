"""Generic SMPL-family body models: SMPL / SMPL-H / MANO / FLAME.

The reference vendors the full smplx package for these
(/root/reference/smplx/body_models.py:46-2453) but uses them only from the
template-extraction tooling. Here the whole family reduces to ONE loader +
ONE forward: the LBS math (sigman_release_tpu/body/lbs.py) is already
joint-count agnostic, so SMPL (24 joints), SMPL-H (52), MANO (16) and FLAME
(5) are just different asset shapes. The SMPL-X production path (PCA hands,
expressions, pose_mean) stays in body/smplx.py.
"""

from __future__ import annotations

import os
import pickle
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.body.lbs import LBSOutput, lbs


class BodyModel(NamedTuple):
    """Minimal LBS body: any SMPL-family member fits this shape."""

    v_template: jnp.ndarray    # [V,3]
    shapedirs: jnp.ndarray     # [V,3,S]
    posedirs: jnp.ndarray      # [(J-1)*9, V*3]
    J_regressor: jnp.ndarray   # [J,V]
    lbs_weights: jnp.ndarray   # [V,J]
    parents: np.ndarray        # [J] static
    faces: np.ndarray          # [F,3] static

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]


def _to_array(v):
    # .pkl releases may hold chumpy arrays; both expose np.asarray via .r
    if hasattr(v, "r"):
        v = v.r
    return np.asarray(v)


def load_body_npz(path: str, num_betas: int = 10) -> BodyModel:
    """Load any SMPL-family asset (.npz, or .pkl with plain/chumpy arrays).

    Key layout is shared across SMPL/SMPL-H/MANO/FLAME releases:
    v_template, shapedirs, posedirs, J_regressor, weights, kintree_table, f.
    """
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="latin1")
    else:
        d = dict(np.load(path, allow_pickle=True))
    shapedirs = _to_array(d["shapedirs"]).astype(np.float32)
    # FLAME packs [300 shape | 100 expression]; clamp to num_betas
    shapedirs = shapedirs[..., :num_betas]
    posedirs = _to_array(d["posedirs"]).astype(np.float32)
    V = posedirs.shape[0]
    if posedirs.ndim == 3:  # [V,3,P] -> [P, V*3]
        posedirs = posedirs.reshape(V * 3, -1).T
    parents = _to_array(d["kintree_table"]).astype(np.int64)[0].astype(
        np.int32
    )
    parents[0] = -1
    jr = _to_array(d["J_regressor"])
    if hasattr(jr, "todense"):  # scipy sparse in some releases
        jr = np.asarray(jr.todense())
    faces = _to_array(d.get("f", d.get("faces"))).astype(np.int64)
    return BodyModel(
        v_template=jnp.asarray(_to_array(d["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(jr, jnp.float32),
        lbs_weights=jnp.asarray(_to_array(d["weights"]), jnp.float32),
        parents=parents,
        faces=faces,
    )


def body_forward(model: BodyModel, betas: jnp.ndarray,
                 pose: jnp.ndarray,
                 transl: Optional[jnp.ndarray] = None) -> LBSOutput:
    """Pose any family member: betas [B,S], pose [B,J*3] axis-angle
    (global orient = joint 0), optional transl [B,3]."""
    out = lbs(betas, pose, model.v_template, model.shapedirs,
              model.posedirs, model.J_regressor, model.parents,
              model.lbs_weights)
    if transl is not None:
        out = out._replace(verts=out.verts + transl[:, None],
                           joints=out.joints + transl[:, None])
    return out
