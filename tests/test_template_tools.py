"""Subdivision, template baking, UV-texture baking tests."""

import numpy as np

from sigman_release_tpu.body.smplx import synthetic_body_model
from sigman_release_tpu.body.subdivide import (
    bake_template,
    region_faces,
    save_template_dir,
    subdivide,
)
from sigman_release_tpu.body.template import load_template_dir
from sigman_release_tpu.data.uv_baking import (
    bake_uv_texture,
    dilate_texture,
    rasterize_mesh,
    scatter_average,
)


def _quad_mesh():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
    return verts, faces


def test_subdivide_splits_selected_faces():
    verts, faces = _quad_mesh()
    attrs = {"w": np.eye(4, dtype=np.float32)}
    v2, f2, a2, mask = subdivide(verts, faces, np.array([True, False]), attrs)
    assert f2.shape[0] == 1 + 4           # kept + 4 children
    assert v2.shape[0] == 4 + 3           # three edge midpoints
    assert mask.sum() == 4
    # midpoint attrs are averages
    np.testing.assert_allclose(a2["w"][4:].sum(axis=1), 1.0, atol=1e-6)
    # children cover the same area as the parent
    def area(v, f):
        e1 = v[f[:, 1]] - v[f[:, 0]]
        e2 = v[f[:, 2]] - v[f[:, 0]]
        return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum()
    np.testing.assert_allclose(area(v2, f2[mask]), 0.5, atol=1e-6)


def test_region_faces():
    _, faces = _quad_mesh()
    mask = region_faces(faces, [0, 1, 2])
    assert mask.tolist() == [True, False]


def test_bake_template_and_roundtrip(tmp_path):
    model = synthetic_body_model(n_verts=256)
    t = bake_template(model)
    assert t.num_gaussians == np.asarray(model.faces).shape[0]
    save_template_dir(t, str(tmp_path))
    t2 = load_template_dir(str(tmp_path))
    np.testing.assert_allclose(np.asarray(t2.init_pcd), np.asarray(t.init_pcd))
    assert t2.init_faces.shape == t.init_faces.shape


def test_bake_template_with_subdivision():
    model = synthetic_body_model(n_verts=256)
    region = list(range(64))  # subdivide faces among the first vertices
    t_plain = bake_template(model)
    t_sub = bake_template(model, subdivide_regions=[region])
    assert t_sub.num_gaussians > t_plain.num_gaussians
    assert t_sub.face_mask.sum() > 0
    # per-face lbs weights remain normalized
    np.testing.assert_allclose(
        np.asarray(t_sub.init_lbsw).sum(-1), 1.0, atol=1e-4
    )


def test_rasterize_mesh_frontal_quad():
    verts = np.array(
        [[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [-0.5, 0.5, 2.0],
         [0.5, 0.5, 2.0]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
    K = np.array([[64.0, 0, 32.0], [0, 64.0, 32.0], [0, 0, 1]])
    r = rasterize_mesh(verts, faces, np.eye(4), K, 64, 64)
    covered = r["face_id"] >= 0
    assert covered.mean() > 0.2                   # quad covers center
    assert not covered[0, 0]                      # corners empty
    d = r["depth"][covered]
    np.testing.assert_allclose(d, 2.0, atol=1e-3)
    assert r["viewcos"][covered].min() > 0.9      # frontal


def test_zbuffer_prefers_near_face():
    # two stacked triangles; the nearer one must win
    verts = np.array(
        [[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.5, 2.0],
         [-0.5, -0.5, 1.0], [0.5, -0.5, 1.0], [0.0, 0.5, 1.0]], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
    K = np.array([[64.0, 0, 32.0], [0, 64.0, 32.0], [0, 0, 1]])
    r = rasterize_mesh(verts, faces, np.eye(4), K, 64, 64)
    covered = r["face_id"] >= 0
    assert (r["face_id"][covered] == 1).mean() > 0.9


def test_bake_uv_texture_recovers_color():
    verts = np.array(
        [[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [-0.5, 0.5, 2.0],
         [0.5, 0.5, 2.0]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
    uv = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    K = np.array([[64.0, 0, 32.0], [0, 64.0, 32.0], [0, 0, 1]])
    img = np.full((64, 64, 3), 0.7, np.float32)
    tex = bake_uv_texture(verts, faces, uv, img[None], np.eye(4)[None], K,
                          texture_size=32)
    # covered texels should carry the projected color
    assert np.isclose(np.median(tex), 0.7, atol=0.05)


def test_dilate_fills_holes():
    tex = np.zeros((8, 8, 3), np.float32)
    w = np.zeros((8, 8), np.float32)
    tex[4, 4] = 1.0
    w[4, 4] = 1.0
    out = dilate_texture(tex, w, iterations=16)
    assert out.min() >= 0 and out[0, 0].max() > 0  # flood reached the corner


def test_mip_fill_sparse_coverage():
    """Texels no sample hits directly get a coarse-mip estimate (reference
    grid_put.py:129-159) instead of staying holes for the dilation pass."""
    from sigman_release_tpu.data.uv_baking import mip_fill, scatter_average

    T = 256
    rng = np.random.default_rng(0)
    # 200 samples over the whole atlas: direct scatter covers <1% of texels
    uv = rng.uniform(0.05, 0.95, (200, 2)).astype(np.float32)
    vals = np.full((200, 3), 0.7, np.float32)
    w = np.ones(200, np.float32)

    tex = np.zeros((T, T, 3), np.float32)
    weight = np.zeros((T, T), np.float32)
    scatter_average(tex, weight, uv, vals, w)
    direct_cov = float((weight > 1e-6).mean())
    assert direct_cov < 0.1

    mip_fill(tex, weight, uv, vals, w)
    filled_cov = float((weight > 1e-6).mean())
    assert filled_cov > 5 * direct_cov  # coarse mips reached far more texels

    covered = weight > 1e-6
    tex[covered] /= weight[covered][:, None]
    # filled texels carry the (constant) sample color, not zeros
    interior = tex[T // 4: 3 * T // 4, T // 4: 3 * T // 4]
    wint = weight[T // 4: 3 * T // 4, T // 4: 3 * T // 4] > 1e-6
    assert wint.mean() > 0.8
    np.testing.assert_allclose(interior[wint], 0.7, atol=1e-3)
