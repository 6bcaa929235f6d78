"""Fast-SNARF inverse skinning (Broyden) tests."""

import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.body.snarf import (
    INIT_BONES,
    SnarfVoxels,
    broyden_search,
    filter_duplicates,
    inverse_skin_points,
    precompute_voxel,
)

J = 55


def _identity_setup(res=16):
    d, h, w = res // 4, res, res
    zs = np.linspace(-1, 1, d)
    ys = np.linspace(-1, 1, h)
    xs = np.linspace(-1, 1, w)
    gz, gy, gx = np.meshgrid(zs, ys, xs, indexing="ij")
    ratio = h / d
    grid = np.stack([gx, gy, gz / ratio], -1).reshape(-1, 3).astype(np.float32)
    lbs = np.zeros((J, d, h, w), np.float32)
    lbs[0] = 1.0  # everything bound to the root bone
    tfs = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
    return jnp.asarray(lbs), jnp.asarray(tfs), jnp.asarray(grid), ratio


def test_precompute_identity():
    lbs, tfs, grid, ratio = _identity_setup()
    vox = precompute_voxel(lbs, tfs, grid)
    # identity transforms -> voxel_d equals the grid itself
    d = np.asarray(vox.voxel_d).reshape(3, -1).T
    np.testing.assert_allclose(d, np.asarray(grid), atol=1e-6)
    Jm = np.asarray(vox.voxel_J).reshape(9, -1).T.reshape(-1, 3, 3)
    np.testing.assert_allclose(Jm, np.broadcast_to(np.eye(3), Jm.shape),
                               atol=1e-6)


def test_broyden_translation_recovers_canonical():
    lbs, tfs, grid, ratio = _identity_setup()
    shift = np.array([0.1, -0.05, 0.02], np.float32)
    tfs = tfs.at[:, :3, 3].set(jnp.asarray(shift))
    vox = precompute_voxel(lbs, tfs, grid)
    rng = np.random.default_rng(0)
    xc_true = rng.uniform(-0.3, 0.3, (32, 3)).astype(np.float32)
    x_d = jnp.asarray(xc_true + shift)
    offset = jnp.zeros((1, 1, 3))
    scale = jnp.asarray(1.0)
    xc, valid = broyden_search(x_d, vox, tfs, offset, scale, ratio)
    v = np.asarray(valid)
    assert v.any()
    # every valid solution maps back to the true canonical point
    err = np.linalg.norm(np.asarray(xc) - xc_true[:, None], axis=-1)
    assert err[v].max() < 1e-2


def test_filter_duplicates_keeps_one():
    n, i = 4, len(INIT_BONES)
    xc = np.zeros((n, i, 3), np.float32)  # all identical -> all duplicates
    valid = np.ones((n, i), bool)
    kept = np.asarray(filter_duplicates(jnp.asarray(xc), jnp.asarray(valid)))
    assert (kept.sum(axis=1) == 1).all()
    # the kept one is the last init (later wins per CUDA semantics)
    assert kept[:, -1].all()


def test_inverse_skin_end_to_end():
    lbs, tfs, grid, ratio = _identity_setup()
    vox_pts = jnp.asarray(np.random.default_rng(1).uniform(-0.2, 0.2, (8, 3)),
                          jnp.float32)
    xc, valid = inverse_skin_points(
        vox_pts, lbs, tfs, grid, jnp.zeros((1, 1, 3)), jnp.asarray(1.0), ratio
    )
    v = np.asarray(valid)
    assert (v.sum(axis=1) >= 1).all()
    err = np.linalg.norm(np.asarray(xc) - np.asarray(vox_pts)[:, None],
                         axis=-1)
    assert err[v].max() < 1e-3
