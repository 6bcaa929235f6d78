"""Precision contract of the kernels' prefix-sum MXU pass modes.

``RasterizeConfig.cumsum_mode`` controls how the triangular prefix-sum
matmuls inside the Pallas kernels run on the MXU (pallas_forward._cumsum0):
full f32 passes, a two-pass bf16 hi+lo split, or a single bf16 pass. The
split mode's rounding (~2^-16 relative per element) is below the kernels'
existing tolerance vs the dense oracle; the single-pass mode trades ~5e-3
image/grad error for maximum MXU throughput. These tests pin those bounds
(measured on the standard 96-gaussian two-view workload).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigman_release_tpu.ops.rasterizer import (
    RasterizeConfig,
    build_cov3d,
    rasterize_single,
)

from utils import orbit_rig, random_gaussians, tan_half_fov

TH = tan_half_fov()


def _render_and_grads(mode):
    g = random_gaussians(96, seed=0)
    cov3d = build_cov3d(jnp.asarray(g["scales"]), jnp.asarray(g["rotations"]))
    cv, cvp, _ = orbit_rig(2)
    means = jnp.asarray(g["means3d"])
    colors = jnp.asarray(g["colors"])
    opa = jnp.asarray(g["opacity"])
    g_img = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 64, 64))
    cfg = RasterizeConfig(
        img_h=64, img_w=64, tan_half_fovx=TH, tan_half_fovy=TH,
        chunk=32, interpret=True, cumsum_mode=mode,
    )
    out = rasterize_single(means, cov3d, colors, opa, cv, cvp,
                           jnp.ones(3), cfg)

    def loss(m, c, col, o):
        r = rasterize_single(m, c, col, o, cv, cvp, jnp.ones(3), cfg)
        return jnp.sum(r["image"] * g_img)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(means, cov3d, colors, opa)
    return np.asarray(out["image"]), [np.asarray(x) for x in grads]


@pytest.mark.parametrize(
    "mode,img_tol,grad_tol",
    [
        # scan = full f32, only the association order differs from the tri
        # matmul (Hillis-Steele tree vs left-to-right): pure f32 rounding
        # (measured: 3e-6 image, 7.2e-4 normalized grad — the backward's
        # tot2 - prefix cancellation amplifies reassociation noise)
        ("scan", 1e-5, 2e-3),
        # mulscan = multiplicative Hillis-Steele transmittance (no log/exp,
        # no tri matmul): pure f32 reassociation, same class as "scan"
        ("mulscan", 1e-5, 2e-3),
        # measured: 8.5e-6 image, <=1.1e-3 normalized grad (cov3d worst)
        ("bf16x2", 3e-5, 3e-3),
        # measured: 4.5e-3 image, <=5.6e-3 normalized grad
        ("bf16", 1.5e-2, 1.5e-2),
    ],
)
def test_cumsum_mode_error_bounds(mode, img_tol, grad_tol):
    img_f32, grads_f32 = _render_and_grads("f32")
    img, grads = _render_and_grads(mode)
    assert np.abs(img - img_f32).max() <= img_tol
    for name, a, b in zip(["means3d", "cov3d", "colors", "opacity"],
                          grads, grads_f32):
        assert np.isfinite(a).all(), name
        scale = np.abs(b).max() + 1e-6
        assert np.abs(a - b).max() / scale <= grad_tol, (
            f"{mode} grad {name}: {np.abs(a - b).max() / scale:.2e}"
        )
