"""SMPL-X body model as pure JAX data + functions.

* ``SMPLXModel`` is a pytree of model constants (template, blend shapes,
  regressor, skinning weights, PCA hand components, pose mean).
* ``load_smplx_npz`` reads the standard SMPL-X release npz layout
  (``SMPLX_NEUTRAL.npz`` etc. — user-provided; licensed assets do not ship
  with either repo).
* ``synthetic_body_model`` builds a procedural model with the *exact* SMPL-X
  structure (55 joints, PCA-12 hands, 486 pose dirs) so every downstream code
  path — param parsing, deformer, voxel baking — is exercised without the
  licensed asset.
* ``smplx_forward`` mirrors the reference fork's forward composition: PCA
  hand expansion, 165-d full pose + pose_mean, concatenated shape+expression
  coefficients, transl applied to verts/joints/A/T
  (/root/reference/core/modules/deformers/smplx/body_models.py:985-1092).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.body.lbs import LBSOutput, lbs

NUM_JOINTS = 55
NUM_BODY_JOINTS = 21

# SMPL-X kinematic tree (kintree_table of the public model):
# 0 pelvis .. 21 R_wrist, 22 jaw, 23/24 eyes, 25-39 left fingers,
# 40-54 right fingers.
SMPLX_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
     18, 19, 15, 15, 15,
     20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
     21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53],
    dtype=np.int32,
)

# curled-hand PCA mean used for the canonical pose
# (/root/reference/core/modules/deformers/smplx_deformer.py:75-78)
HAND_PCA_CANO = np.array(
    [1.4624, -0.1615, 0.1361, 1.3851, -0.2597, 0.0247, -0.0683, -0.4478,
     -0.6652, -0.7290, 0.0084, -0.4818],
    dtype=np.float32,
)


class SMPLXModel(NamedTuple):
    v_template: jnp.ndarray       # [V,3]
    shapedirs: jnp.ndarray        # [V,3,n_betas]
    expr_dirs: jnp.ndarray        # [V,3,n_expr]
    posedirs: jnp.ndarray         # [(J-1)*9, V*3]
    J_regressor: jnp.ndarray      # [J,V]
    lbs_weights: jnp.ndarray      # [V,J]
    parents: np.ndarray           # [J] static
    faces: np.ndarray             # [F,3] static int
    hand_components_l: jnp.ndarray  # [n_pca,45]
    hand_components_r: jnp.ndarray  # [n_pca,45]
    hand_mean_l: jnp.ndarray      # [45]
    hand_mean_r: jnp.ndarray      # [45]

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]


class SMPLXParams(NamedTuple):
    """Batched pose/shape parameters; hand poses may be PCA or full 45-d."""

    betas: jnp.ndarray            # [B,10]
    expression: jnp.ndarray       # [B,10]
    global_orient: jnp.ndarray    # [B,3]
    body_pose: jnp.ndarray        # [B,63]
    jaw_pose: jnp.ndarray         # [B,3]
    leye_pose: jnp.ndarray        # [B,3]
    reye_pose: jnp.ndarray        # [B,3]
    left_hand_pose: jnp.ndarray   # [B,12] (PCA) or [B,45]
    right_hand_pose: jnp.ndarray  # [B,12] or [B,45]
    transl: jnp.ndarray           # [B,3]
    scale: jnp.ndarray            # [B,1]


def load_smplx_npz(path: str) -> SMPLXModel:
    """Load the standard SMPL-X npz release (first 10 betas, 10 expressions)."""
    d = np.load(path, allow_pickle=True)
    shapedirs_all = np.asarray(d["shapedirs"], np.float32)
    # SMPL-X packs [300 shape | 100 expression] (older releases: 10|10)
    n_shape = 10
    if shapedirs_all.shape[-1] >= 310:
        shape = shapedirs_all[..., :n_shape]
        expr = shapedirs_all[..., 300:310]
    else:
        shape = shapedirs_all[..., :n_shape]
        expr = shapedirs_all[..., n_shape:n_shape + 10]
    posedirs = np.asarray(d["posedirs"], np.float32)
    V = posedirs.shape[0]
    posedirs = posedirs.reshape(V * 3, -1).T                   # [(J-1)*9, V*3]
    parents = np.asarray(d["kintree_table"], np.int64)[0].astype(np.int32)
    parents[0] = -1
    return SMPLXModel(
        v_template=jnp.asarray(d["v_template"], jnp.float32),
        shapedirs=jnp.asarray(shape),
        expr_dirs=jnp.asarray(expr),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(d["J_regressor"], jnp.float32),
        lbs_weights=jnp.asarray(d["weights"], jnp.float32),
        parents=parents,
        faces=np.asarray(d["f"], np.int64),
        hand_components_l=jnp.asarray(d["hands_componentsl"][:12], jnp.float32),
        hand_components_r=jnp.asarray(d["hands_componentsr"][:12], jnp.float32),
        hand_mean_l=jnp.asarray(d["hands_meanl"], jnp.float32),
        hand_mean_r=jnp.asarray(d["hands_meanr"], jnp.float32),
    )


def synthetic_body_model(n_verts: int = 1024, seed: int = 0) -> SMPLXModel:
    """Procedural SMPL-X-shaped model for tests (see module docstring)."""
    rng = np.random.default_rng(seed)
    J = NUM_JOINTS

    # rest joints: a rough humanoid skeleton — wide in x/y, thin in z
    # (the deformer's LBS voxel compresses z by 4x like a real body)
    joints = np.zeros((J, 3), np.float32)
    joints[0] = (0, 0, 0)
    for j in range(1, J):
        p = SMPLX_PARENTS[j]
        direction = rng.normal(0, 1, 3)
        direction[1] -= 0.5   # bias limbs downward
        direction[2] *= 0.2   # keep the body flat in z
        direction /= np.linalg.norm(direction) + 1e-6
        joints[j] = joints[p] + direction * rng.uniform(0.05, 0.15)
    joints[:, 2] *= 0.25

    # vertices sampled around the bone segments
    seg = rng.integers(1, J, n_verts)
    t = rng.uniform(0, 1, (n_verts, 1)).astype(np.float32)
    base = joints[SMPLX_PARENTS[seg]] * (1 - t) + joints[seg] * t
    verts = (base + rng.normal(0, 0.015, (n_verts, 3))).astype(np.float32)

    # skinning weights: sharp softmax over joint distance, truncated to the
    # 4 nearest joints — real SMPL-X weights are near-sparse, and the
    # deformer's double-skinning composite (sum_j w A_j)(sum_j w A_j^-1) is
    # only ~rigid when weights are concentrated
    d2 = ((verts[:, None, :] - joints[None]) ** 2).sum(-1)
    w = np.exp(-d2 / 0.002)
    top4 = np.argsort(-w, axis=1)[:, :4]
    mask = np.zeros_like(w)
    np.put_along_axis(mask, top4, 1.0, axis=1)
    w = w * mask
    w = (w / w.sum(-1, keepdims=True)).astype(np.float32)

    # J_regressor recovering rest joints approximately: nearest-vertex average
    reg = np.zeros((J, n_verts), np.float32)
    nearest = np.argsort(d2, axis=0)[:8]                      # [8,J]
    for j in range(J):
        reg[j, nearest[:, j]] = 1.0 / 8

    faces = np.stack(
        [np.arange(n_verts - 2), np.arange(1, n_verts - 1),
         np.arange(2, n_verts)], axis=-1,
    ).astype(np.int64)

    return SMPLXModel(
        v_template=jnp.asarray(verts),
        shapedirs=jnp.asarray(rng.normal(0, 0.01, (n_verts, 3, 10)), jnp.float32),
        expr_dirs=jnp.asarray(rng.normal(0, 0.002, (n_verts, 3, 10)), jnp.float32),
        posedirs=jnp.asarray(
            rng.normal(0, 0.001, ((J - 1) * 9, n_verts * 3)), jnp.float32
        ),
        J_regressor=jnp.asarray(reg),
        lbs_weights=jnp.asarray(w),
        parents=SMPLX_PARENTS.copy(),
        faces=faces,
        # small PCA components: the canonical pose curls hands through these
        # (HAND_PCA_CANO) and the deformer's double-skinning composite is
        # only ~rigid when neighbouring-bone transforms stay coherent
        hand_components_l=jnp.asarray(
            rng.normal(0, 0.02, (12, 45)), jnp.float32
        ),
        hand_components_r=jnp.asarray(
            rng.normal(0, 0.02, (12, 45)), jnp.float32
        ),
        hand_mean_l=jnp.zeros(45, jnp.float32),
        hand_mean_r=jnp.zeros(45, jnp.float32),
    )


def smplx_forward(model: SMPLXModel, params: SMPLXParams) -> LBSOutput:
    """Full SMPL-X forward pass returning LBS internals (A, T, offsets)."""
    B = params.betas.shape[0]
    lh, rh = params.left_hand_pose, params.right_hand_pose
    if lh.shape[-1] != 45:                                    # PCA hands
        lh = lh @ model.hand_components_l
        rh = rh @ model.hand_components_r

    full_pose = jnp.concatenate(
        [params.global_orient.reshape(B, 3),
         params.body_pose.reshape(B, NUM_BODY_JOINTS * 3),
         params.jaw_pose.reshape(B, 3),
         params.leye_pose.reshape(B, 3),
         params.reye_pose.reshape(B, 3),
         lh.reshape(B, 45), rh.reshape(B, 45)],
        axis=-1,
    )                                                          # [B,165]
    # pose_mean affects only the hands when flat_hand_mean is False
    pose_mean = jnp.concatenate(
        [jnp.zeros(75, full_pose.dtype), model.hand_mean_l, model.hand_mean_r]
    )
    full_pose = full_pose + pose_mean

    shape_comps = jnp.concatenate([params.betas, params.expression], axis=-1)
    shapedirs = jnp.concatenate([model.shapedirs, model.expr_dirs], axis=-1)

    out = lbs(shape_comps, full_pose, model.v_template, shapedirs,
              model.posedirs, model.J_regressor, model.parents,
              model.lbs_weights)

    # transl shifts verts/joints/A/T; params.scale is deliberately IGNORED —
    # the reference's SMPL-X forward has the scale application commented out
    # (/root/reference/core/modules/deformers/smplx/body_models.py:1068-1073),
    # so even the 123-d layout's scale coefficient never takes effect.
    transl = params.transl.reshape(B, 1, 3)
    verts = out.verts + transl
    joints = out.joints + transl
    A = out.A.at[..., :3, 3].add(transl)
    T = out.T.at[..., :3, 3].add(transl)
    return LBSOutput(verts, joints, A, T, out.shape_offset, out.pose_offset,
                     out.pose_feature)


def canonical_params(B: int = 1, pca_hands: bool = True) -> SMPLXParams:
    """Canonical-space pose: T-pose with curled-hand PCA mean, y += 0.35.

    Matches SMPLXDeformer.initialize
    (/root/reference/core/modules/deformers/smplx_deformer.py:67-119).
    """
    z = jnp.zeros((B, 3), jnp.float32)
    hands = (
        jnp.broadcast_to(jnp.asarray(HAND_PCA_CANO), (B, 12))
        if pca_hands else jnp.zeros((B, 45), jnp.float32)
    )
    return SMPLXParams(
        betas=jnp.zeros((B, 10), jnp.float32),
        expression=jnp.zeros((B, 10), jnp.float32),
        global_orient=z,
        body_pose=jnp.zeros((B, 63), jnp.float32),
        jaw_pose=z, leye_pose=z, reye_pose=z,
        left_hand_pose=hands, right_hand_pose=hands,
        transl=jnp.broadcast_to(jnp.array([0.0, 0.35, 0.0]), (B, 3)),
        scale=jnp.ones((B, 1), jnp.float32),
    )


def parse_param_vector(vec: Optional[jnp.ndarray],
                       batch: int = 1) -> SMPLXParams:
    """Parse the reference's flat smpl_params layouts (120/123/175/179/188-d).

    Mirrors SMPLXDeformer.prepare_deformer's branches
    (/root/reference/core/modules/deformers/smplx_deformer.py:121-245):

    * ``None`` / 120-d — the default path: a zero vector split as (scale,
      orient, body, betas, lh12, rh12, jaw, eyes, expr) with fixed transl
      (0, 0.35, 0) and the curled-hand PCA mean overriding both hands. The
      reference only reaches this split with zeros (``smpl_params=None``), so
      everything except the overrides is zero by construction.
    * 175-d — AMASS order (orient, body, lhand45, rhand45, jaw, eyes, betas);
      transl fixed.
    * 179-d / 188-d — (transl, orient, betas, body, expr, hands45[, jaw,
      eyes]); transl AND orient overridden to the fixed values.
    * anything else — the reference's else-branch: (scale, transl, orient,
      body, betas, lh12, rh12, jaw, eyes, expr), 123 dims, everything kept.
    """
    if vec is None or vec.shape[1] == 120:
        B = batch if vec is None else vec.shape[0]
        base = canonical_params(B, pca_hands=True)
        if vec is None:
            return base
        # honor any non-zero entries a caller did pass (split mirrors the
        # reference's 120-d order, minus transl which the vector lacks)
        _s, go, body, betas, _lh, _rh, jaw, le, re, expr = _split(
            vec, [1, 3, 63, 10, 12, 12, 3, 3, 3, 10])
        return base._replace(betas=betas, expression=expr, global_orient=go,
                             body_pose=body, jaw_pose=jaw, leye_pose=le,
                             reye_pose=re)

    B, D = vec.shape
    transl_fixed = jnp.broadcast_to(jnp.array([0.0, 0.35, 0.0]), (B, 3))
    ones = jnp.ones((B, 1), jnp.float32)
    z3 = jnp.zeros((B, 3), jnp.float32)

    if D == 175:   # AMASS: orient, body, lhand45, rhand45, jaw, eyes, betas
        go, body, lh, rh, jaw, le, re, betas = _split(
            vec, [3, 63, 45, 45, 3, 3, 3, 10])
        return SMPLXParams(betas, jnp.zeros((B, 10)), go, body, jaw, le, re,
                           lh, rh, transl_fixed, ones)
    if D == 179:
        _t, _go, betas, body, expr, lh, rh = _split(
            vec, [3, 3, 10, 63, 10, 45, 45])
        return SMPLXParams(betas, expr, z3, body, z3, z3, z3, lh, rh,
                           transl_fixed, ones)
    if D == 188:
        _t, _go, betas, body, expr, lh, rh, jaw, le, re = _split(
            vec, [3, 3, 10, 63, 10, 45, 45, 3, 3, 3])
        return SMPLXParams(betas, expr, z3, body, jaw, le, re, lh, rh,
                           transl_fixed, ones)
    if D == 123:   # reference else-branch: everything kept from the vector
        scale, transl, go, body, betas, lh, rh, jaw, le, re, expr = _split(
            vec, [1, 3, 3, 63, 10, 12, 12, 3, 3, 3, 10])
        return SMPLXParams(betas, expr, go, body, jaw, le, re, lh, rh,
                           transl, scale)
    raise ValueError(f"unknown smpl_params layout with {D} dims")


def _split(vec: jnp.ndarray, sizes):
    out, o = [], 0
    for s in sizes:
        out.append(vec[:, o:o + s])
        o += s
    assert o == vec.shape[1], (o, vec.shape)
    return out
