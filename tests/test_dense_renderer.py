"""Golden-model (dense) renderer sanity tests."""

import jax
import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.ops.rasterizer.preprocess import (
    build_cov3d,
    project_gaussians,
)
from sigman_release_tpu.ops.rasterizer.reference import render_dense

from utils import orbit_rig, random_gaussians, tan_half_fov


def _setup(n=64, seed=0):
    g = random_gaussians(n, seed=seed)
    cov3d = build_cov3d(jnp.asarray(g["scales"]), jnp.asarray(g["rotations"]))
    cam_view, cam_view_proj, cam_pos = orbit_rig(1)
    return g, cov3d, cam_view[0], cam_view_proj[0]


def test_projection_centers_cloud():
    g, cov3d, cv, cvp = _setup()
    th = tan_half_fov()
    proj = project_gaussians(jnp.asarray(g["means3d"]), cov3d, cv, cvp, th, th, 64, 64)
    assert bool(proj.valid.any())
    m = np.asarray(proj.mean2d)[np.asarray(proj.valid)]
    # cloud sits near the origin -> projections near image center
    assert 10 < m[:, 0].mean() < 54 and 10 < m[:, 1].mean() < 54
    assert np.asarray(proj.depth)[np.asarray(proj.valid)].min() > 0.2


def test_dense_render_composites():
    g, cov3d, cv, cvp = _setup()
    th = tan_half_fov()
    out = render_dense(
        jnp.asarray(g["means3d"]), cov3d, jnp.asarray(g["colors"]),
        jnp.asarray(g["opacity"]), cv, cvp, th, th, 64, 64,
        bg_color=jnp.ones(3),
    )
    img, alpha, depth = out["image"], out["alpha"], out["depth"]
    assert img.shape == (3, 64, 64)
    assert alpha.shape == (1, 64, 64) and depth.shape == (1, 64, 64)
    a = np.asarray(alpha)
    assert 0.0 <= a.min() and a.max() <= 1.0 + 1e-6
    assert a.max() > 0.3  # something rendered
    # background pixels are bg color
    img_np = np.asarray(img)
    corner = img_np[:, 0, 0]
    np.testing.assert_allclose(corner, 1.0, atol=1e-5)
    # depth of rendered pixels is near cam distance (radius 1.5)
    hit = a[0] > 0.5
    if hit.any():
        d = np.asarray(depth)[0][hit] / a[0][hit]
        assert 0.5 < d.mean() < 2.5


def test_single_gaussian_lands_at_projection():
    th = tan_half_fov()
    cam_view, cam_view_proj, _ = orbit_rig(1)
    means = jnp.array([[0.1, -0.05, 0.0]], dtype=jnp.float32)
    cov3d = build_cov3d(jnp.full((1, 3), 0.05), jnp.eye(3)[None])
    out = render_dense(
        means, cov3d, jnp.array([[1.0, 0.0, 0.0]]), jnp.array([0.9]),
        cam_view[0], cam_view_proj[0], th, th, 64, 64, bg_color=jnp.zeros(3),
    )
    a = np.asarray(out["alpha"])[0]
    proj = project_gaussians(means, cov3d, cam_view[0], cam_view_proj[0],
                             th, th, 64, 64)
    cx, cy = np.asarray(proj.mean2d)[0]
    iy, ix = np.unravel_index(a.argmax(), a.shape)
    assert abs(ix - cx) <= 1.5 and abs(iy - cy) <= 1.5
    # red gaussian on black bg
    img = np.asarray(out["image"])
    assert img[0].max() > 0.5 and img[1].max() < 1e-4


def test_dense_render_grads_finite():
    g, cov3d, cv, cvp = _setup(n=32)
    th = tan_half_fov()

    def loss_fn(means, cov, colors, opa):
        out = render_dense(means, cov, colors, opa, cv, cvp, th, th, 32, 32,
                           bg_color=jnp.ones(3))
        return jnp.sum(out["image"] ** 2) + jnp.sum(out["alpha"])

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(
        jnp.asarray(g["means3d"]), cov3d, jnp.asarray(g["colors"]),
        jnp.asarray(g["opacity"]),
    )
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
    # some gradient must flow
    assert np.abs(np.asarray(grads[0])).max() > 0


def test_golden_file_pin():
    """Pins the oracle's compositing behavior to a COMMITTED artifact
    (tests/golden/) so oracle and Pallas kernels can't drift together
    silently. Regenerate deliberately if compositing rules change (the
    fp16 storage sets the tolerance)."""
    import os

    from utils import orbit_rig, random_gaussians, tan_half_fov

    from sigman_release_tpu.ops.rasterizer import build_cov3d, render_dense

    golden = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                  "dense_render_96g_64px.npz"))
    th = tan_half_fov()
    g = random_gaussians(96, seed=0)
    cov3d = build_cov3d(jnp.asarray(g["scales"]),
                        jnp.asarray(g["rotations"]))
    cv, cvp, _ = orbit_rig(2)
    for v in range(2):
        r = render_dense(jnp.asarray(g["means3d"]), cov3d,
                         jnp.asarray(g["colors"]), jnp.asarray(g["opacity"]),
                         cv[v], cvp[v], th, th, 64, 64,
                         bg_color=jnp.ones(3))
        np.testing.assert_allclose(np.asarray(r["image"], np.float32),
                                   golden[f"image_{v}"].astype(np.float32),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(r["alpha"], np.float32),
                                   golden[f"alpha_{v}"].astype(np.float32),
                                   atol=2e-3)
