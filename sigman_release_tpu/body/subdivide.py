"""Template extraction: selective mesh subdivision + asset baking.

Port of the reference's one-time template scripts (SURVEY.md §2.1 #27;
/root/reference/core/modules/deformers/subdivide_smplx.py:11-87,208-290 and
utils_smplx.py:114-162) as library functions:

* ``subdivide`` — one level of 4-way midpoint subdivision restricted to a
  face mask (face/ears/eyes/hands in the reference), carrying per-vertex
  attributes (LBS weights, shape dirs, pose dirs) by midpoint averaging,
* ``region_faces`` — face mask from vertex-id region lists (segmentation
  JSONs in the reference),
* ``bake_template`` — face centers, face-center UV, TBN frames, per-face LBS
  weights, region point-masks -> TemplateAssets ready for the deformer/VAE.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.body.smplx import SMPLXModel, canonical_params, smplx_forward
from sigman_release_tpu.body.template import TemplateAssets, compute_tbn


def region_faces(faces: np.ndarray, region_verts: Sequence[int]) -> np.ndarray:
    """Faces whose three vertices all lie in the region. [F] bool."""
    sel = np.zeros(int(faces.max()) + 1, bool)
    sel[np.asarray(list(region_verts), np.int64)] = True
    return sel[faces].all(axis=1)


def subdivide(
    verts: np.ndarray,          # [V,3]
    faces: np.ndarray,          # [F,3]
    face_mask: np.ndarray,      # [F] bool — faces to split 4-way
    vert_attrs: Dict[str, np.ndarray],  # each [V, ...]
) -> Tuple[np.ndarray, np.ndarray, Dict[str, np.ndarray], np.ndarray]:
    """Returns (verts', faces', attrs', new_face_mask) — new_face_mask marks
    faces that came from subdivided originals."""
    face_mask = np.asarray(face_mask, bool)
    split = faces[face_mask]
    keep = faces[~face_mask]

    # unique midpoint per undirected edge
    edges = np.concatenate(
        [split[:, [0, 1]], split[:, [1, 2]], split[:, [2, 0]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    uniq, inv = np.unique(edges, axis=0, return_inverse=True)
    mid_base = verts.shape[0]
    mid_verts = 0.5 * (verts[uniq[:, 0]] + verts[uniq[:, 1]])

    n = split.shape[0]
    m01 = mid_base + inv[:n]
    m12 = mid_base + inv[n:2 * n]
    m20 = mid_base + inv[2 * n:]
    new_faces = np.concatenate([
        np.stack([split[:, 0], m01, m20], axis=1),
        np.stack([m01, split[:, 1], m12], axis=1),
        np.stack([m20, m12, split[:, 2]], axis=1),
        np.stack([m01, m12, m20], axis=1),
    ])

    out_faces = np.concatenate([keep, new_faces])
    out_verts = np.concatenate([verts, mid_verts])
    out_attrs = {
        k: np.concatenate([a, 0.5 * (a[uniq[:, 0]] + a[uniq[:, 1]])])
        for k, a in vert_attrs.items()
    }
    new_mask = np.concatenate(
        [np.zeros(keep.shape[0], bool), np.ones(new_faces.shape[0], bool)]
    )
    return out_verts, out_faces, out_attrs, new_mask


def bake_template(
    model: SMPLXModel,
    subdivide_regions: Optional[Sequence[Sequence[int]]] = None,
    vert_uv: Optional[np.ndarray] = None,
) -> TemplateAssets:
    """Bake template assets, optionally subdividing the given vertex regions.

    ``vert_uv`` [V,2] supplies a real UV atlas (e.g. from the SMPL-X UV obj);
    without one a cylindrical projection is used.
    """
    out = smplx_forward(model, canonical_params(1))
    verts = np.asarray(out.verts[0])
    faces = np.asarray(model.faces)

    J = model.lbs_weights.shape[1]
    n_pose = np.asarray(model.posedirs).shape[0]
    attrs = {
        "lbsw": np.asarray(model.lbs_weights),
        "spdir": np.concatenate(
            [np.asarray(model.shapedirs), np.asarray(model.expr_dirs)], axis=-1
        ),
        # posedirs [(J-1)*9, V*3] -> per-vertex [V, 3, P]
        "podir": np.asarray(model.posedirs).T.reshape(verts.shape[0], 3, n_pose),
    }
    if vert_uv is not None:
        attrs["uv"] = np.asarray(vert_uv, np.float32)

    sub_mask = np.zeros(faces.shape[0], bool)
    if subdivide_regions:
        for region in subdivide_regions:
            sub_mask |= region_faces(faces, region)
        verts, faces, attrs, from_sub = subdivide(verts, faces, sub_mask, attrs)
    else:
        from_sub = np.zeros(faces.shape[0], bool)

    centers = verts[faces].mean(axis=1)
    if "uv" in attrs:
        uv_faces = attrs["uv"][faces].mean(axis=1)
    else:
        rel = centers - centers.mean(0)
        u = np.arctan2(rel[:, 0], rel[:, 2]) / (2 * np.pi) + 0.5
        v = (rel[:, 1] - rel[:, 1].min()) / (np.ptp(rel[:, 1]) + 1e-6)
        uv_faces = np.stack([u, v], axis=-1).astype(np.float32)
        vw = np.zeros((verts.shape[0], 2), np.float32)
        cnt = np.zeros(verts.shape[0], np.float32)
        for i in range(3):
            np.add.at(vw, faces[:, i], uv_faces)
            np.add.at(cnt, faces[:, i], 1.0)
        attrs["uv"] = vw / np.maximum(cnt[:, None], 1.0)

    rot = compute_tbn(verts, faces, attrs["uv"])
    face_lbsw = attrs["lbsw"][faces].mean(axis=1)
    podir = attrs["podir"].reshape(verts.shape[0] * 3, -1).T  # [(J-1)*9, V*3]

    return TemplateAssets(
        init_uv=jnp.asarray(uv_faces, jnp.float32),
        init_pcd=jnp.asarray(centers, jnp.float32),
        init_rot=jnp.asarray(rot, jnp.float32),
        init_faces=faces.astype(np.int64),
        init_lbsw=jnp.asarray(face_lbsw, jnp.float32),
        init_spdir=jnp.asarray(attrs["spdir"], jnp.float32),
        init_podir=jnp.asarray(podir, jnp.float32),
        face_mask=from_sub,
        hands_mask=None,
        outside_mask=None,
    )


def save_template_dir(template: TemplateAssets, path: str,
                      suffix: str = "smplx_thu") -> None:
    """Write the reference's template npy layout (load_template_dir inverse)."""
    import os

    os.makedirs(path, exist_ok=True)
    np.save(f"{path}/init_uv_{suffix}.npy", np.asarray(template.init_uv))
    np.save(f"{path}/init_pcd_{suffix}.npy", np.asarray(template.init_pcd))
    np.save(f"{path}/init_rot_{suffix}.npy", np.asarray(template.init_rot))
    np.save(f"{path}/init_faces_{suffix}.npy", np.asarray(template.init_faces))
    np.save(f"{path}/init_lbsw_{suffix}.npy", np.asarray(template.init_lbsw))
    np.save(f"{path}/init_spdir_{suffix}.npy", np.asarray(template.init_spdir))
    np.save(f"{path}/init_podir_{suffix}.npy", np.asarray(template.init_podir))
    if template.face_mask is not None:
        np.save(f"{path}/face_mask_thu.npy", np.asarray(template.face_mask))
