"""Quality metrics: PSNR, masked PSNR, SSIM (11x11 Gaussian window).

Matches the reference's definitions: PSNR = -10 log10(MSE)
(/root/reference/core/modules/autoencoder.py:354-356), masked PSNR
(autoencoder.py:447-451), SSIM with an 11-tap sigma-1.5 Gaussian window
(/root/reference/core/loss/eval.py:7-64) — here as a jit-able depthwise conv
instead of cv2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """-10 log10(mean (pred-gt)^2); inputs in [0,1]."""
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def masked_psnr(pred, gt, mask):
    """10 log10(max^2 / mse) over masked pixels (reference convention)."""
    mse = jnp.mean((pred * mask - gt * mask) ** 2)
    max_val = jnp.max(pred * mask)
    return 10.0 * jnp.log10(jnp.maximum(max_val ** 2, 1e-12)
                            / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11):
    """Mean SSIM. img [C,H,W] or [B,C,H,W] in [0,1]."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    b, c, h, w = img1.shape
    win = jnp.asarray(_gaussian_window(window_size))
    kernel = jnp.broadcast_to(
        win[:, :, None, None], (window_size, window_size, 1, c)
    )

    def filt(x):  # depthwise valid conv
        x = jnp.moveaxis(x, 1, -1)  # NHWC
        out = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return out

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return jnp.mean(ssim_map)
