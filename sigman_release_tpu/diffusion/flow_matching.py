"""Rectified-flow scheduler with resolution-aware timestep shifting.

The reference ships this as an unused alternative
(/root/reference/core/schedule/flow_matching.py — defined, never imported);
provided here for feature parity. x_t = (1-t) x0 + t noise, model predicts
the velocity (noise - x0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class FlowScheduler:
    def __init__(self, num_train_timesteps: int = 1000, shift: float = 1.0):
        self.num_train_timesteps = num_train_timesteps
        self.shift = shift

    def shift_t(self, t: jnp.ndarray) -> jnp.ndarray:
        """Resolution-aware logit shift of t in (0,1)."""
        if self.shift == 1.0:
            return t
        return self.shift * t / (1.0 + (self.shift - 1.0) * t)

    def sample_t(self, key, batch: int, logit_mean=0.0, logit_std=1.0):
        """Logit-normal timestep sampling (common rectified-flow practice)."""
        u = jax.random.normal(key, (batch,)) * logit_std + logit_mean
        return self.shift_t(jax.nn.sigmoid(u))

    def add_noise(self, x0, noise, t):
        shape = (-1,) + (1,) * (x0.ndim - 1)
        t = t.reshape(shape)
        return (1.0 - t) * x0 + t * noise

    def velocity_target(self, x0, noise):
        return noise - x0

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        ts = np.linspace(1.0, 0.0, num_inference_steps + 1)[:-1]
        return jnp.asarray(self.shift_t(jnp.asarray(ts)), jnp.float32)

    def step(self, velocity, t, t_prev, sample):
        """Euler step along the straight path."""
        return sample + (t_prev - t) * velocity
