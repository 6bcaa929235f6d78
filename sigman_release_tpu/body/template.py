"""Template assets: per-Gaussian anchors on the (subdivided) body mesh.

The reference bakes these once with its template-extraction scripts
(/root/reference/core/modules/deformers/preprocess_smplx.py,
subdivide_smplx.py, utils_smplx.py) and ships them as ``template/*.npy``:
``init_uv`` (face-center UV), ``init_pcd`` (face-center canonical positions),
``init_rot`` (per-face TBN frames), ``init_faces``, ``init_lbsw``,
``init_spdir``/``init_podir`` (per-vertex blend-shape dirs of the subdivided
mesh) and region masks. This module loads that layout — and can generate a
structurally identical synthetic set from any ``SMPLXModel`` (used by tests
and by users without the licensed assets).
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.body.smplx import SMPLXModel, canonical_params, smplx_forward


class TemplateAssets(NamedTuple):
    init_uv: jnp.ndarray        # [N,2] face-center UV in [0,1]
    init_pcd: jnp.ndarray       # [N,3] face-center canonical positions
    init_rot: jnp.ndarray       # [N,3,3] per-face TBN frames
    init_faces: np.ndarray      # [N,3] subdivided-mesh vertex ids (static)
    init_lbsw: jnp.ndarray      # [N,J] per-face-center skinning weights
    init_spdir: jnp.ndarray     # [V,3,20] per-vertex shape(+expr) dirs
    init_podir: jnp.ndarray     # [486, V*3] per-vertex pose dirs
    face_mask: Optional[np.ndarray] = None   # [N] bool (face region)
    hands_mask: Optional[np.ndarray] = None  # [N] bool
    outside_mask: Optional[np.ndarray] = None  # [N] bool (non-FLAME override)

    @property
    def num_gaussians(self) -> int:
        return self.init_pcd.shape[0]


def load_template_dir(path: str, suffix: str = "smplx_thu") -> TemplateAssets:
    """Load the reference's baked template layout (``init_*_{suffix}.npy``)."""
    p = Path(path)

    def arr(name, required=True):
        f = p / f"{name}_{suffix}.npy"
        if not f.exists():
            if required:
                raise FileNotFoundError(f)
            return None
        return np.load(f)

    def opt_mask(name):
        f = p / f"{name}_mask_thu.npy"
        return np.load(f).astype(bool) if f.exists() else None

    return TemplateAssets(
        init_uv=jnp.asarray(arr("init_uv"), jnp.float32),
        init_pcd=jnp.asarray(arr("init_pcd"), jnp.float32),
        init_rot=jnp.asarray(arr("init_rot"), jnp.float32),
        init_faces=np.asarray(arr("init_faces"), np.int64),
        init_lbsw=jnp.asarray(arr("init_lbsw"), jnp.float32),
        init_spdir=jnp.asarray(arr("init_spdir"), jnp.float32),
        init_podir=jnp.asarray(arr("init_podir"), jnp.float32),
        face_mask=opt_mask("face"),
        hands_mask=opt_mask("hands"),
        outside_mask=opt_mask("outside"),
    )


def compute_tbn(verts: np.ndarray, faces: np.ndarray, uv: np.ndarray):
    """Per-face tangent/bitangent/normal frames [F,3,3] (columns T,B,N).

    Equivalent of the reference's compute_tbn (utils_smplx.py:87-111): the
    tangent follows the UV u-direction so decoded rotation deltas are
    expressed in a consistent surface frame.
    """
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    uv0, uv1, uv2 = (uv[faces[:, i]] for i in range(3))
    e1, e2 = v1 - v0, v2 - v0
    duv1, duv2 = uv1 - uv0, uv2 - uv0
    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    det = np.where(np.abs(det) < 1e-12, 1e-12, det)
    r = 1.0 / det
    tangent = (e1 * duv2[:, 1:2] - e2 * duv1[:, 1:2]) * r[:, None]
    normal = np.cross(e1, e2)

    def norm(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    normal = norm(normal)
    tangent = norm(tangent - normal * (tangent * normal).sum(-1, keepdims=True))
    bitangent = np.cross(normal, tangent)
    return np.stack([tangent, bitangent, normal], axis=-1)


def synthetic_template(model: SMPLXModel, seed: int = 0) -> TemplateAssets:
    """Bake a template from a body model's canonical pose.

    Gaussians anchor at face centers; UVs come from a cylindrical projection
    of the canonical positions (a stand-in for the SMPL-X UV atlas).
    """
    out = smplx_forward(model, canonical_params(1))
    verts = np.asarray(out.verts[0])
    faces = np.asarray(model.faces)

    centers = verts[faces].mean(axis=1)

    # cylindrical UV around the vertical axis
    rel = centers - centers.mean(0)
    u = (np.arctan2(rel[:, 0], rel[:, 2]) / (2 * np.pi) + 0.5)
    span = np.ptp(rel[:, 1]) + 1e-6
    v = (rel[:, 1] - rel[:, 1].min()) / span
    uv_faces = np.stack([u, v], axis=-1).astype(np.float32)

    vert_uv = np.zeros((verts.shape[0], 2), np.float32)
    counts = np.zeros(verts.shape[0], np.float32)
    for i in range(3):
        np.add.at(vert_uv, faces[:, i], uv_faces)
        np.add.at(counts, faces[:, i], 1.0)
    vert_uv /= np.maximum(counts[:, None], 1.0)

    rot = compute_tbn(verts, faces, vert_uv)

    lbsw_np = np.asarray(model.lbs_weights)
    face_lbsw = lbsw_np[faces].mean(axis=1)

    spdirs = np.concatenate(
        [np.asarray(model.shapedirs), np.asarray(model.expr_dirs)], axis=-1
    )
    return TemplateAssets(
        init_uv=jnp.asarray(uv_faces),
        init_pcd=jnp.asarray(centers, jnp.float32),
        init_rot=jnp.asarray(rot, jnp.float32),
        init_faces=faces.astype(np.int64),
        init_lbsw=jnp.asarray(face_lbsw, jnp.float32),
        init_spdir=jnp.asarray(spdirs, jnp.float32),
        init_podir=model.posedirs,
        face_mask=None,
        hands_mask=None,
        outside_mask=None,
    )
