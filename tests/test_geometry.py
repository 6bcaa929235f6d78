"""Camera math + rays unit tests."""

import math

import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.geometry.cameras import (
    camera_bundle,
    intrinsics_projection_matrix,
    look_at,
    orbit_camera,
    projection_matrix,
)
from sigman_release_tpu.geometry.rays import get_rays, plucker_rays


def test_projection_matrix_matches_intrinsics_path():
    # centered principal point: K path and fov path must agree
    f, s = 1100.0, 1024
    fov = 2 * math.atan(s / (2 * f))
    K = np.array([[f, 0, s / 2], [0, f, s / 2], [0, 0, 1.0]])
    P_fov = projection_matrix(0.1, 100.0, fov, fov)
    P_k = intrinsics_projection_matrix(0.1, 100.0, K, s, s)
    np.testing.assert_allclose(P_fov, P_k, atol=1e-9)


def test_projection_depth_range():
    P = projection_matrix(0.1, 100.0, 0.87, 0.87)
    for z, expect in [(0.1, 0.0), (100.0, 1.0)]:
        p = np.array([0.0, 0.0, z, 1.0])
        clip = P @ p
        ndc = clip / clip[3]
        assert abs(ndc[2] - expect) < 1e-6
        assert clip[3] == z  # w = +z


def test_look_at_points_camera_at_target():
    c2w = look_at(np.array([0.0, 0.0, -2.0]), np.zeros(3))
    # camera z axis (third column) points from campos toward target
    np.testing.assert_allclose(c2w[:3, 2], [0, 0, 1], atol=1e-12)
    # rotation orthonormal
    R = c2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)


def test_camera_bundle_projects_origin_to_center():
    P = projection_matrix(0.1, 100.0, 0.87, 0.87)
    c2w = orbit_camera(10.0, 30.0, 1.5)
    cam_view, cam_view_proj, cam_pos = camera_bundle(c2w[None], P)
    np.testing.assert_allclose(cam_pos[0], c2w[:3, 3], atol=1e-6)
    hom = np.array([[0.0, 0.0, 0.0, 1.0]], dtype=np.float32)
    clip = hom @ cam_view_proj[0]
    ndc = clip[0, :2] / clip[0, 3]
    np.testing.assert_allclose(ndc, [0, 0], atol=1e-5)
    view = hom @ cam_view[0]
    assert abs(view[0, 2] - 1.5) < 1e-5  # target at radius depth


def test_rays_center_pixel_points_forward():
    c2w = jnp.eye(4)
    h = w = 8
    rays_o, rays_d = get_rays(c2w, h, w, 0.9, opengl=False)
    assert rays_o.shape == (h, w, 3) and rays_d.shape == (h, w, 3)
    # all directions unit norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rays_d), axis=-1), 1.0, atol=1e-5
    )
    # center ray ~ +z (OpenCV)
    center = np.asarray(rays_d)[h // 2, w // 2]
    assert center[2] > 0.99


def test_plucker_orthogonality():
    c2w = jnp.asarray(orbit_camera(20.0, 45.0, 1.5), dtype=jnp.float32)
    pl = plucker_rays(c2w, 8, 8, 0.9)
    m, d = np.asarray(pl[..., :3]), np.asarray(pl[..., 3:])
    # moment is orthogonal to direction
    assert np.abs((m * d).sum(-1)).max() < 1e-5
