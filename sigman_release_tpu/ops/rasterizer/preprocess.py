"""Gaussian projection / EWA 2D covariance — the per-view preprocessing stage.

This is the batched, MXU-friendly JAX equivalent of the per-thread
``preprocessCUDA`` stage of the reference's external CUDA rasterizer
(``diff_gaussian_rasterization``; consumed at
/root/reference/core/gaussians/gs.py:96-106). Everything here is standard
differentiable JAX — XLA fuses it into a handful of kernels — and it is shared
by the dense golden-model renderer and the Pallas tile renderer.

Conventions (see geometry/cameras.py): row vectors, ``cam_view = w2c.T``,
``cam_view_proj = w2c.T @ P.T``, view z positive in front of the camera.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def build_cov3d(scale: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Packed upper-triangular 3D covariance from scales and rotations.

    scale [N,3], rot [N,3,3] -> [N,6] packed (xx, xy, xz, yy, yz, zz),
    Sigma = R diag(s^2) R^T. Equivalent of the reference's get_covariance +
    strip_lowerdiag (/root/reference/core/gaussians/gs.py:17-38).
    """
    m = rot * (scale[:, None, :] ** 2)          # R @ diag(s^2)
    sigma = m @ jnp.swapaxes(rot, -1, -2)       # [N,3,3]
    return jnp.stack(
        [sigma[:, 0, 0], sigma[:, 0, 1], sigma[:, 0, 2],
         sigma[:, 1, 1], sigma[:, 1, 2], sigma[:, 2, 2]],
        axis=-1,
    )


class ProjectedGaussians(NamedTuple):
    mean2d: jnp.ndarray   # [N,2] pixel coords
    depth: jnp.ndarray    # [N] view-space z
    conic: jnp.ndarray    # [N,3] inverse 2D covariance (a, b, c)
    radius: jnp.ndarray   # [N] screen-space extent (pixels, float)
    valid: jnp.ndarray    # [N] bool — in frustum and non-degenerate


def project_gaussians(
    means3d: jnp.ndarray,       # [N,3]
    cov3d: jnp.ndarray,         # [N,6] packed
    cam_view: jnp.ndarray,      # [4,4] w2c.T
    cam_view_proj: jnp.ndarray, # [4,4]
    tan_half_fovx: float,
    tan_half_fovy: float,
    img_h: int,
    img_w: int,
) -> ProjectedGaussians:
    """Project 3D Gaussians to screen space for one camera."""
    f = jnp.float32
    means3d = means3d.astype(f)
    cov3d = cov3d.astype(f)
    cam_view = cam_view.astype(f)
    cam_view_proj = cam_view_proj.astype(f)

    ones = jnp.ones_like(means3d[:, :1])
    hom = jnp.concatenate([means3d, ones], axis=-1)          # [N,4]

    p_view = hom @ cam_view                                   # [N,4]
    depth = p_view[:, 2]
    in_front = depth > 0.2                                    # matches CUDA near cull

    p_hom = hom @ cam_view_proj                               # [N,4]
    # Denominators are sanitized BEFORE the division: culled points would
    # otherwise produce inf/NaN here, and even though every downstream
    # consumer masks on `valid`, a zero cotangent times an inf partial is
    # NaN — the masked rows must be finite all the way through for the VJP
    # of the whole projection to stay finite.
    p_w = 1.0 / jnp.where(in_front, p_hom[:, 3] + 1e-7, 1.0)
    p_proj = p_hom[:, :3] * p_w[:, None]                      # ndc

    # ndc2Pix: ((ndc + 1) * S - 1) / 2
    mean2d = jnp.stack(
        [((p_proj[:, 0] + 1.0) * img_w - 1.0) * 0.5,
         ((p_proj[:, 1] + 1.0) * img_h - 1.0) * 0.5],
        axis=-1,
    )

    focal_x = img_w / (2.0 * tan_half_fovx)
    focal_y = img_h / (2.0 * tan_half_fovy)

    # EWA: clamp view-space x/y to 1.3 * fov cone (as the CUDA preprocess does)
    tz = jnp.where(in_front, depth, 1.0)      # finite-grad guard (see p_w)
    limx = 1.3 * tan_half_fovx
    limy = 1.3 * tan_half_fovy
    tx = jnp.clip(p_view[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(p_view[:, 1] / tz, -limy, limy) * tz

    # J = d(pix)/d(view): 2x3 Jacobian of the perspective projection
    j00 = focal_x / tz
    j02 = -focal_x * tx / (tz * tz)
    j11 = focal_y / tz
    j12 = -focal_y * ty / (tz * tz)

    W = cam_view[:3, :3].T                                    # w2c rotation
    # V = W Sigma W^T ; then cov2d = J V J^T (2x2). Computed in
    # struct-of-arrays form: a [N,3,3] einsum forces XLA to pad the tiny
    # (3,3) trailing dims to full (8,128) vector tiles — a >100x memory
    # blowup measured as the dominant cost of this stage on-chip.
    s = [cov3d[:, i] for i in range(6)]     # xx, xy, xz, yy, yz, zz
    sig_rows = ((s[0], s[1], s[2]), (s[1], s[3], s[4]), (s[2], s[4], s[5]))

    def wsig(i, k):                          # (W Sigma)[i,k] as [N]
        return (W[i, 0] * sig_rows[0][k] + W[i, 1] * sig_rows[1][k]
                + W[i, 2] * sig_rows[2][k])

    def vcomp(i, l):                         # (W Sigma W^T)[i,l] as [N]
        return wsig(i, 0) * W[l, 0] + wsig(i, 1) * W[l, 1] + wsig(i, 2) * W[l, 2]

    v00 = vcomp(0, 0); v01 = vcomp(0, 1); v02 = vcomp(0, 2)
    v11 = vcomp(1, 1); v12 = vcomp(1, 2); v22 = vcomp(2, 2)
    c00 = j00 * j00 * v00 + 2 * j00 * j02 * v02 + j02 * j02 * v22 + 0.3
    c11 = j11 * j11 * v11 + 2 * j11 * j12 * v12 + j12 * j12 * v22 + 0.3
    c01 = j00 * j11 * v01 + j00 * j12 * v02 + j02 * j11 * v12 + j02 * j12 * v22

    det = c00 * c11 - c01 * c01
    det_ok = det > 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], axis=-1)

    mid = 0.5 * (c00 + c11)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    valid = in_front & det_ok & (radius > 0)
    radius = jnp.where(valid, radius, 0.0)
    return ProjectedGaussians(mean2d, depth, conic, radius, valid)


