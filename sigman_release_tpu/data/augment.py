"""Host-side data augmentation (numpy): grid distortion + camera jitter.

Numpy re-designs of /root/reference/core/utils.py:44-103. These run in the
CPU input pipeline (not under jit), so plain numpy + cv2.remap is the right
tool — no device round trips.
"""

from __future__ import annotations

import cv2
import numpy as np

from sigman_release_tpu.ops.rotations import rodrigues
import jax.numpy as jnp


def grid_distortion(images: np.ndarray, rng: np.random.Generator,
                    strength: float = 0.5) -> np.ndarray:
    """Random smooth warp. images [V,C,H,W] float in [0,1]."""
    V, C, H, W = images.shape
    num_steps = int(rng.integers(8, 17))
    out = np.empty_like(images)
    for v in range(V):
        x_steps = np.linspace(0, 1, num_steps)
        x_steps = np.clip(
            x_steps + strength * (rng.random(num_steps) - 0.5) / (num_steps - 1),
            0, 1,
        )
        x_steps = (x_steps * W).astype(np.int64)
        x_steps[0], x_steps[-1] = 0, W
        y_steps = np.linspace(0, 1, num_steps)
        y_steps = np.clip(
            y_steps + strength * (rng.random(num_steps) - 0.5) / (num_steps - 1),
            0, 1,
        )
        y_steps = (y_steps * H).astype(np.int64)
        y_steps[0], y_steps[-1] = 0, H

        grid_steps = np.linspace(-1, 1, num_steps)
        xs = np.concatenate([
            np.linspace(grid_steps[i], grid_steps[i + 1],
                        x_steps[i + 1] - x_steps[i], endpoint=False)
            for i in range(num_steps - 1)
        ])
        ys = np.concatenate([
            np.linspace(grid_steps[i], grid_steps[i + 1],
                        y_steps[i + 1] - y_steps[i], endpoint=False)
            for i in range(num_steps - 1)
        ])
        # normalized [-1,1] -> pixel coords (align_corners=False convention)
        map_x = ((xs + 1) * W - 1) * 0.5
        map_y = ((ys + 1) * H - 1) * 0.5
        mx, my = np.meshgrid(map_x.astype(np.float32),
                             map_y.astype(np.float32))
        img = images[v].transpose(1, 2, 0)
        warped = cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_CONSTANT)
        if warped.ndim == 2:
            warped = warped[..., None]
        out[v] = warped.transpose(2, 0, 1)
    return out


def orbit_camera_jitter(poses: np.ndarray, rng: np.random.Generator,
                        strength: float = 0.1, is_w2c: bool = False) -> np.ndarray:
    """Rotate cameras around the subject. poses [V,4,4]."""
    V = poses.shape[0]
    rotvec_x = poses[:, :3, 1] * (
        strength * np.pi * (rng.random((V, 1)) * 2 - 1)
    )
    rotvec_y = poses[:, :3, 0] * (
        strength * np.pi / 2 * (rng.random((V, 1)) * 2 - 1)
    )
    Rx = np.asarray(rodrigues(jnp.asarray(rotvec_x, jnp.float32)))
    Ry = np.asarray(rodrigues(jnp.asarray(rotvec_y, jnp.float32)))
    rot = Rx @ Ry
    out = poses.copy()
    if is_w2c:
        rot_inv = rot.transpose(0, 2, 1)
        out[:, :3, :3] = poses[:, :3, :3] @ rot_inv
        out[:, :3, 3:] = -out[:, :3, :3] @ rot @ (-poses[:, :3, 3:])
    else:
        out[:, :3, :3] = rot @ poses[:, :3, :3]
        out[:, :3, 3:] = rot @ poses[:, :3, 3:]
    return out
