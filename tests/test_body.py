"""SMPL-X body model, LBS, deformer, template tests (synthetic model)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sigman_release_tpu.body import (
    GaussianDeformer,
    lbs,
    smplx_forward,
    synthetic_body_model,
    synthetic_template,
)
from sigman_release_tpu.body.lbs import rigid_inverse, skinning
from sigman_release_tpu.body.smplx import (
    SMPLX_PARENTS,
    canonical_params,
    parse_param_vector,
)


@pytest.fixture(scope="module")
def model():
    return synthetic_body_model(n_verts=512)


@pytest.fixture(scope="module")
def template(model):
    return synthetic_template(model)


def test_zero_pose_identity(model):
    """Zero pose, zero betas, no transl -> verts == template."""
    p = canonical_params(1, pca_hands=True)._replace(
        left_hand_pose=jnp.zeros((1, 12)),
        right_hand_pose=jnp.zeros((1, 12)),
        transl=jnp.zeros((1, 3)),
    )
    out = smplx_forward(model, p)
    np.testing.assert_allclose(
        np.asarray(out.verts[0]), np.asarray(model.v_template), atol=1e-4
    )
    # A should be (near) identity for every joint
    eye = np.broadcast_to(np.eye(4), out.A.shape[1:])
    np.testing.assert_allclose(np.asarray(out.A[0]), eye, atol=1e-4)


def test_global_rotation_rotates_rigidly(model):
    angle = np.pi / 2
    p = canonical_params(1)._replace(
        left_hand_pose=jnp.zeros((1, 12)),
        right_hand_pose=jnp.zeros((1, 12)),
        transl=jnp.zeros((1, 3)),
        global_orient=jnp.array([[0.0, angle, 0.0]]),
    )
    out = smplx_forward(model, p)
    # rotating the whole body preserves pairwise distances
    v = np.asarray(out.verts[0])
    t = np.asarray(model.v_template)
    dv = np.linalg.norm(v[1:] - v[:-1], axis=-1)
    dt = np.linalg.norm(t[1:] - t[:-1], axis=-1)
    np.testing.assert_allclose(dv, dt, atol=1e-3)
    # root joint stays at origin-ish (pelvis on axis)
    assert np.linalg.norm(np.asarray(out.joints[0, 0])) < 0.2


def test_transl_applied_scale_ignored(model):
    """transl shifts everything; scale is a no-op — the reference's SMPL-X
    forward comments the scale application out (body_models.py:1068-1073)."""
    p0 = canonical_params(1)._replace(transl=jnp.zeros((1, 3)))
    p1 = p0._replace(transl=jnp.array([[0.5, -0.2, 0.1]]),
                     scale=jnp.array([[2.0]]))
    v0 = np.asarray(smplx_forward(model, p0).verts[0])
    v1 = np.asarray(smplx_forward(model, p1).verts[0])
    np.testing.assert_allclose(v1, v0 + [0.5, -0.2, 0.1], atol=1e-4)


def test_param_vector_layouts(model):
    from sigman_release_tpu.body.smplx import HAND_PCA_CANO

    rng = np.random.default_rng(3)

    # None / 120-d zeros -> canonical defaults with curled-hand PCA mean
    p_none = parse_param_vector(None, batch=2)
    p_120 = parse_param_vector(jnp.zeros((2, 120)))
    np.testing.assert_allclose(np.asarray(p_120.left_hand_pose),
                               np.broadcast_to(HAND_PCA_CANO, (2, 12)))
    np.testing.assert_allclose(np.asarray(p_none.transl),
                               np.broadcast_to([0.0, 0.35, 0.0], (2, 3)))
    for a, b in zip(p_none, p_120):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # 123-d else-branch: everything kept, incl. transl
    vec = jnp.asarray(rng.normal(0, 0.1, (2, 123)), jnp.float32)
    p = parse_param_vector(vec)
    assert p.left_hand_pose.shape == (2, 12)
    np.testing.assert_allclose(np.asarray(p.transl), np.asarray(vec[:, 1:4]))
    np.testing.assert_allclose(np.asarray(p.global_orient),
                               np.asarray(vec[:, 4:7]))
    out = smplx_forward(model, p)
    assert np.isfinite(np.asarray(out.verts)).all()

    # 179/188-d: transl+orient overridden, expression kept
    for d, has_jaw in ((179, False), (188, True)):
        vec = jnp.asarray(rng.normal(0, 0.1, (1, d)), jnp.float32)
        p = parse_param_vector(vec)
        assert p.left_hand_pose.shape == (1, 45)
        np.testing.assert_allclose(np.asarray(p.global_orient), 0.0)
        np.testing.assert_allclose(np.asarray(p.transl),
                                   [[0.0, 0.35, 0.0]])
        np.testing.assert_allclose(np.asarray(p.expression),
                                   np.asarray(vec[:, 79:89]))
        if has_jaw:
            np.testing.assert_allclose(np.asarray(p.jaw_pose),
                                       np.asarray(vec[:, 179:182]))
        else:
            np.testing.assert_allclose(np.asarray(p.jaw_pose), 0.0)

    import pytest

    with pytest.raises(ValueError):
        parse_param_vector(jnp.zeros((1, 127)))


def test_pose_feature_shape_and_amass_parsing(model):
    vec = jnp.asarray(np.random.default_rng(0).normal(0, 0.1, (2, 175)),
                      jnp.float32)
    params = parse_param_vector(vec)
    assert params.left_hand_pose.shape == (2, 45)
    out = smplx_forward(model, params)
    assert out.pose_feature.shape == (2, 54 * 9)
    assert out.A.shape == (2, 55, 4, 4)
    assert np.isfinite(np.asarray(out.verts)).all()


def test_rigid_inverse():
    rng = np.random.default_rng(1)
    from sigman_release_tpu.ops.rotations import quaternion_to_matrix
    R = np.asarray(quaternion_to_matrix(rng.normal(size=(5, 4)).astype(np.float32)))
    T = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    T[:, :3, :3] = R
    T[:, :3, 3] = rng.normal(size=(5, 3))
    Ti = np.asarray(rigid_inverse(jnp.asarray(T)))
    prod = np.einsum("nij,njk->nik", T, Ti)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape),
                               atol=1e-5)


def test_skinning_single_bone():
    """Weights one-hot on bone j -> points move rigidly with bone j."""
    B, N, J = 1, 16, 4
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    tfs = np.tile(np.eye(4, dtype=np.float32), (B, J, 1, 1))
    tfs[0, 2, :3, 3] = [1.0, 2.0, 3.0]
    w = np.zeros((B, N, J), np.float32)
    w[..., 2] = 1.0
    posed, w_tf = skinning(pts, jnp.asarray(w), jnp.asarray(tfs))
    np.testing.assert_allclose(
        np.asarray(posed), np.asarray(pts) + [1.0, 2.0, 3.0], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(w_tf[0, 0]), tfs[0, 2], atol=1e-6)


def test_deformer_roundtrip(model, template):
    """Deforming to the canonical pose itself reproduces the face centers."""
    deformer = GaussianDeformer(
        model, template.init_faces, template.init_spdir, template.init_podir,
        template.init_lbsw, weight_mask=None,
    )
    state = deformer.initialize()
    posed_state = deformer.prepare(state, canonical_params(1))
    pts = template.init_pcd[None]
    xd, tf = deformer(state, posed_state, pts)
    err = np.abs(np.asarray(xd) - np.asarray(pts)).max()
    assert err < 5e-3, f"canonical roundtrip error {err}"
    # composite transforms ~ identity
    eye = np.broadcast_to(np.eye(4), tf.shape[1:])
    assert np.abs(np.asarray(tf[0]) - eye).max() < 2e-2


def test_deformer_posed_moves_points(model, template):
    deformer = GaussianDeformer(
        model, template.init_faces, template.init_spdir, template.init_podir,
        template.init_lbsw, weight_mask=None,
    )
    state = deformer.initialize()
    rng = np.random.default_rng(3)
    vec = jnp.asarray(rng.normal(0, 0.15, (1, 175)), jnp.float32)
    posed_state = deformer.prepare(state, parse_param_vector(vec))
    pts = template.init_pcd[None]
    xd, tf = deformer(state, posed_state, pts)
    assert np.isfinite(np.asarray(xd)).all()
    moved = np.abs(np.asarray(xd) - np.asarray(pts)).max()
    assert moved > 1e-3  # pose actually moved points
    # rotations stay near-rigid (LBS blending makes them only approximately
    # orthonormal; bound the typical determinant drift)
    R = np.asarray(tf)[0, :, :3, :3]
    det = np.linalg.det(R)
    # synthetic skeleton + voxel-smoothed weights drift more than real
    # SMPL-X weights would; bound the drift loosely
    assert np.median(np.abs(det - 1.0)) < 0.15
    assert np.abs(det - 1.0).max() < 0.6


def test_template_shapes(model, template):
    n = template.num_gaussians
    assert template.init_uv.shape == (n, 2)
    assert template.init_rot.shape == (n, 3, 3)
    assert template.init_lbsw.shape[0] == n
    # TBN frames orthonormal
    R = np.asarray(template.init_rot)
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", R, R), eye, atol=1e-4
    )
    uv = np.asarray(template.init_uv)
    assert uv.min() >= 0.0 and uv.max() <= 1.0


def test_parents_table_valid():
    assert SMPLX_PARENTS.shape == (55,)
    assert SMPLX_PARENTS[0] == -1
    assert (SMPLX_PARENTS[1:] < np.arange(1, 55)).all()


def test_inference_pose_loaders(tmp_path):
    """scripts/test_DiT.load_pose handles the reference's three pose-file
    layouts (single / sequence / AMASS, scripts/test_DiT.py:100-166) and
    yields a [1,188] vector parse_param_vector accepts."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from test_DiT import load_pose

    from sigman_release_tpu.body.smplx import parse_param_vector

    rng = np.random.default_rng(0)
    single = {k: rng.normal(0, 0.1, d).astype(np.float32)
              for k, d in [("transl", 3), ("global_orient", 3), ("betas", 10),
                           ("body_pose", 63), ("expression", 10),
                           ("left_hand_pose", 45), ("right_hand_pose", 45),
                           ("jaw_pose", 3), ("leye_pose", 3),
                           ("reye_pose", 3)]}
    np.savez(tmp_path / "single.npz", **single)
    seq = {k: np.stack([v, v * 0.5]) for k, v in single.items()}
    np.savez(tmp_path / "seq.npz", **seq)
    T = 3
    np.savez(tmp_path / "amass.npz",
             trans=rng.normal(0, 0.1, (T, 3)).astype(np.float32),
             root_orient=rng.normal(0, 0.1, (T, 3)).astype(np.float32),
             betas=rng.normal(0, 0.1, 16).astype(np.float32),
             pose_body=rng.normal(0, 0.1, (T, 63)).astype(np.float32),
             pose_hand=rng.normal(0, 0.1, (T, 90)).astype(np.float32),
             pose_jaw=rng.normal(0, 0.1, (T, 3)).astype(np.float32),
             pose_eye=rng.normal(0, 0.1, (T, 6)).astype(np.float32))

    for name in ("single.npz", "seq.npz", "amass.npz"):
        vec = load_pose(str(tmp_path / name), frame=1 if name != "single.npz"
                        else 0)
        assert vec.shape == (1, 188), name
        parsed = parse_param_vector(jnp.asarray(vec))
        assert parsed.body_pose.shape[-1] == 63, name
    # sequence frame selection picks the right frame
    v1 = load_pose(str(tmp_path / "seq.npz"), frame=1)
    np.testing.assert_allclose(v1[0, :3], single["transl"] * 0.5)
    # AMASS betas are zeroed (reference load_amass quirk)
    va = load_pose(str(tmp_path / "amass.npz"))
    np.testing.assert_array_equal(va[0, 6:16], np.zeros(10))


@pytest.mark.parametrize("name,J,V", [("smpl", 24, 120), ("mano", 16, 60),
                                      ("flame", 5, 40)])
def test_generic_body_family(tmp_path, name, J, V):
    """One loader + one forward covers SMPL/MANO/FLAME asset shapes
    (reference vendors the full smplx package for these,
    smplx/body_models.py:46-2453)."""
    from sigman_release_tpu.body.family import body_forward, load_body_npz

    rng = np.random.default_rng(J)
    parents = np.zeros((2, J), np.int64)
    parents[0] = np.arange(J) - 1
    parents[0, 0] = 4294967295  # smpl releases store uint32 -1
    np.savez(
        tmp_path / f"{name}.npz",
        v_template=rng.normal(0, 0.2, (V, 3)).astype(np.float32),
        shapedirs=rng.normal(0, 0.01, (V, 3, 10)).astype(np.float32),
        posedirs=rng.normal(0, 0.001, (V, 3, (J - 1) * 9)).astype(np.float32),
        J_regressor=(np.ones((J, V), np.float32) / V),
        weights=np.eye(J, dtype=np.float32)[rng.integers(0, J, V)],
        kintree_table=parents,
        f=rng.integers(0, V, (2 * V, 3)),
    )
    model = load_body_npz(str(tmp_path / f"{name}.npz"))
    assert model.num_joints == J and model.num_verts == V
    betas = jnp.zeros((2, 10))
    pose = jnp.asarray(rng.normal(0, 0.2, (2, J * 3)), jnp.float32)
    out = body_forward(model, betas, pose,
                       transl=jnp.asarray([[0.0, 0.0, 0.0], [0, 1, 0]]))
    assert out.verts.shape == (2, V, 3)
    assert np.isfinite(np.asarray(out.verts)).all()
    # zero pose with identity-ish: verts finite and translation applies
    out0 = body_forward(model, betas, jnp.zeros((2, J * 3)),
                        transl=jnp.asarray([[0.0, 0.0, 0.0], [0, 1, 0]]))
    np.testing.assert_allclose(
        np.asarray(out0.verts[1] - out0.verts[0]),
        np.broadcast_to([0, 1, 0], (V, 3)), atol=1e-5,
    )
