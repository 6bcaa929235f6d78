"""Image-conditioned sampling pipeline: DiT denoise loop -> VAE decode -> render.

Equivalent of the reference's SamplesPipeline
(/root/reference/core/modules/sample_pipeline/DDPM_sample_pipeline.py:140-520):
prepare latents (N(0,1) x init_noise_sigma), 30-step DDIM v-prediction loop
with classifier-free guidance (x2 batch: conditioning features vs zeros),
final ``latents /= vae_scaling_factor`` then VAE decode + splat render.

TPU-native: the whole denoise loop is one ``lax.fori_loop`` inside jit —
no per-step host round trips.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from sigman_release_tpu.config import Config
from sigman_release_tpu.diffusion.ddim import DDIMScheduler


class SamplePipeline:
    """Bundles the jitted denoise loop; decode/render is supplied by the
    caller (training/inference code) as ``decode_fn(latents, data)``."""

    def __init__(self, cfg: Config, scheduler: Optional[DDIMScheduler] = None):
        self.cfg = cfg
        self.scheduler = scheduler or DDIMScheduler(
            num_train_timesteps=cfg.num_train_timesteps,
            beta_start=cfg.beta_start,
            beta_end=cfg.beta_end,
            beta_schedule=cfg.beta_schedule,
            prediction_type=cfg.prediction_type,
            rescale_betas_zero_snr=cfg.rescale_betas_zero_snr,
            snr_shift_scale=cfg.snr_shift_scale,
            timestep_spacing=cfg.timestep_spacing,
        )

    @functools.partial(jax.jit, static_argnames=("self", "dit_apply",
                                                 "num_inference_steps",
                                                 "guidance_scale"))
    def sample_latents(
        self,
        dit_apply: Callable,          # (params, latent, cond, t[B]) -> v
        dit_params: Any,
        cond_feats: jnp.ndarray,      # [B,1536,hc,wc]
        key: jax.Array,
        num_inference_steps: int = 30,
        guidance_scale: float = 3.5,
    ) -> jnp.ndarray:
        """Run the CFG DDIM loop. Returns latents [B,C,h,w] (unscaled)."""
        cfg = self.cfg
        b = cond_feats.shape[0]
        shape = (b, cfg.latent_channels, cfg.sample_height, cfg.sample_width)
        latents = (
            jax.random.normal(key, shape) * self.scheduler.init_noise_sigma
        )
        ts = self.scheduler.timesteps(num_inference_steps)
        ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])
        use_cfg = guidance_scale > 1.0

        def body(i, latents):
            t = ts[i]
            tp = ts_prev[i]
            if use_cfg:
                lat2 = jnp.concatenate([latents, latents], axis=0)
                cond2 = jnp.concatenate(
                    [jnp.zeros_like(cond_feats), cond_feats], axis=0
                )
                tb = jnp.full((2 * b,), t, jnp.int32)
                v = dit_apply(dit_params, lat2, cond2, tb)
                v_uncond, v_cond = jnp.split(v, 2, axis=0)
                v = v_uncond + guidance_scale * (v_cond - v_uncond)
            else:
                tb = jnp.full((b,), t, jnp.int32)
                v = dit_apply(dit_params, latents, cond_feats, tb)
            return self.scheduler.step(v, t, tp, latents)

        latents = jax.lax.fori_loop(0, num_inference_steps, body, latents)
        return latents / cfg.vae_scaling_factor

    def __call__(
        self,
        dit_apply: Callable,
        dit_params: Any,
        cond_feats: jnp.ndarray,
        decode_fn: Callable[[jnp.ndarray], Dict[str, jnp.ndarray]],
        key: jax.Array,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
    ) -> Dict[str, jnp.ndarray]:
        latents = self.sample_latents(
            dit_apply, dit_params, cond_feats, key,
            num_inference_steps=num_inference_steps or self.cfg.num_inference_steps,
            guidance_scale=(
                self.cfg.guidance_scale if guidance_scale is None
                else guidance_scale
            ),
        )
        return decode_fn(latents)
