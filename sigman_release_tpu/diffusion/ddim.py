"""CogVideoX-style DDIM scheduler (v-prediction, zero-SNR, trailing spacing).

JAX port of the semantics configured by the reference's
core/schedule/scheduler_config.json (CogVideoXDDIMScheduler, diffusers):

* scaled_linear betas: ``linspace(sqrt(b0), sqrt(b1), T)^2``,
* optional SNR shift: ``a' = a / (s - (s-1) a)``,
* zero-terminal-SNR rescale of ``sqrt(alphas_cumprod)`` (Lin et al. 2024),
* v-prediction: ``v = sqrt(a) eps - sqrt(1-a) x0``,
* "trailing" inference timesteps: ``round(arange(T, 0, -T/n)) - 1``,
* deterministic DDIM step (eta = 0) with ``set_alpha_to_one``.

Stateless: all methods are pure functions over the precomputed tables so the
whole sampling loop jits into one XLA program (used as lax.fori_loop body by
diffusion/pipeline.py).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Shift+scale sqrt(abar) so the final timestep has zero SNR."""
    s = np.sqrt(alphas_cumprod)
    s0 = s[0].copy()
    sT = s[-1].copy()
    s = s - sT                        # terminal -> 0
    s = s * s0 / (s0 - sT)            # keep first value
    return s ** 2


class DDIMScheduler:
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "v_prediction",
        rescale_betas_zero_snr: bool = True,
        snr_shift_scale: float = 1.0,
        timestep_spacing: str = "trailing",
        set_alpha_to_one: bool = True,
        steps_offset: int = 0,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset

        if beta_schedule == "scaled_linear":
            betas = (
                np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps) ** 2
            )
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps)
        else:
            raise ValueError(beta_schedule)
        alphas_cumprod = np.cumprod(1.0 - betas)

        if snr_shift_scale != 1.0:
            alphas_cumprod = alphas_cumprod / (
                snr_shift_scale - (snr_shift_scale - 1.0) * alphas_cumprod
            )
        if rescale_betas_zero_snr:
            alphas_cumprod = _rescale_zero_terminal_snr(alphas_cumprod)

        self.alphas_cumprod = jnp.asarray(alphas_cumprod, jnp.float32)
        self.final_alpha_cumprod = jnp.asarray(
            1.0 if set_alpha_to_one else float(alphas_cumprod[0]), jnp.float32
        )
        self.init_noise_sigma = 1.0

    # ---- training ----------------------------------------------------------

    def add_noise(self, x0, noise, t):
        """q(x_t | x_0). t [B] int; x0/noise [B,...]."""
        a = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (
            jnp.sqrt(a).reshape(shape) * x0
            + jnp.sqrt(1.0 - a).reshape(shape) * noise
        )

    def get_velocity(self, x0, noise, t):
        """v-target: sqrt(a) eps - sqrt(1-a) x0."""
        a = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (
            jnp.sqrt(a).reshape(shape) * noise
            - jnp.sqrt(1.0 - a).reshape(shape) * x0
        )

    def snr_weights(self, t):
        """The DiT trainer's loss weights 1/(1 - abar_t)
        (/root/reference/train_DiT.py:378-390)."""
        return 1.0 / (1.0 - self.alphas_cumprod[t])

    # ---- sampling ----------------------------------------------------------

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        T = self.num_train_timesteps
        if self.timestep_spacing == "trailing":
            ts = np.round(np.arange(T, 0, -T / num_inference_steps)).astype(
                np.int64
            ) - 1
        elif self.timestep_spacing == "leading":
            step = T // num_inference_steps
            ts = (np.arange(num_inference_steps) * step).round()[::-1].astype(
                np.int64
            ) + self.steps_offset
        else:  # linspace
            ts = np.linspace(0, T - 1, num_inference_steps).round()[::-1]
            ts = ts.astype(np.int64)
        return jnp.asarray(ts, jnp.int32)

    def step(self, model_output, t, t_prev, sample):
        """Deterministic DDIM update x_t -> x_{t_prev}.

        t/t_prev are int32 scalars (t_prev < 0 selects final_alpha_cumprod).
        """
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(
            t_prev >= 0,
            self.alphas_cumprod[jnp.maximum(t_prev, 0)],
            self.final_alpha_cumprod,
        )
        sqrt_a = jnp.sqrt(a_t)
        sqrt_1ma = jnp.sqrt(1.0 - a_t)
        if self.prediction_type == "v_prediction":
            x0 = sqrt_a * sample - sqrt_1ma * model_output
            eps = sqrt_a * model_output + sqrt_1ma * sample
        elif self.prediction_type == "epsilon":
            x0 = (sample - sqrt_1ma * model_output) / sqrt_a
            eps = model_output
        else:  # "sample"
            x0 = model_output
            eps = (sample - sqrt_a * x0) / sqrt_1ma
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
