"""DiT training: DDPM v-prediction in the frozen VAE's latent space.

Re-design of /root/reference/train_DiT.py:176-587: encode multi-view input
through the frozen VAE (latent x vae_scaling_factor), encode the conditioning
image, add noise at uniform timesteps, predict v, weight the (pred - x0)^2
loss by 1/(1 - abar_t) (train_DiT.py:378-390), with conditioning dropout for
CFG (train_DiT.py:120-121). One jitted SPMD train step; RoPE and the joint
cond/image attention live inside the DiTModel.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sigman_release_tpu.config import Config
from sigman_release_tpu.diffusion.ddim import DDIMScheduler
from sigman_release_tpu.diffusion.pipeline import SamplePipeline
from sigman_release_tpu.models.dit import DiTModel
from sigman_release_tpu.models.encoders import ViTFeatureEncoder
from sigman_release_tpu.models.vae import VAEModel
from sigman_release_tpu.parallel.mesh import (
    make_mesh,
    prefetch_to_device,
    shard_batch,
)
from sigman_release_tpu.training.checkpoint import (
    load_checkpoint,
    load_params_any,
    save_checkpoint,
    sniff_format,
    tolerant_restore,
)


class DiTTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class DiTTrainer:
    def __init__(self, cfg: Config, vae_params=None, encoder_params=None,
                 mesh=None, spmd: Optional[str] = None,
                 latent_renderer=None):
        """``latent_renderer``: optional ``(z [B,h,w,Cl], batch) -> outputs``
        decode+deform+render callable (VAETrainer.render_latent bound to the
        frozen VAE params). When set, the periodic eval also runs the full
        CFG sampling pipeline on held-out conditioning images and renders
        the generated avatar next to GT (reference train_DiT.py:417-457)."""
        self.cfg = cfg
        self.spmd = spmd or "shard_map"
        self.latent_renderer = latent_renderer
        self.model = DiTModel(cfg)
        self.vae = VAEModel(cfg)
        self.vae_params = vae_params            # frozen
        self.encoder = ViTFeatureEncoder(embed_dim=cfg.text_embed_dim)
        self.encoder_params = encoder_params    # frozen
        self.scheduler = DDIMScheduler(
            num_train_timesteps=cfg.num_train_timesteps,
            beta_start=cfg.beta_start,
            beta_end=cfg.beta_end,
            beta_schedule=cfg.beta_schedule,
            prediction_type=cfg.prediction_type,
            rescale_betas_zero_snr=cfg.rescale_betas_zero_snr,
            snr_shift_scale=cfg.snr_shift_scale,
            timestep_spacing=cfg.timestep_spacing,
        )
        self.pipeline = SamplePipeline(cfg, self.scheduler)
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.mesh_shape, cfg.mesh_axes
        )
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, cfg.lr_warmup_steps,
            max(cfg.lr_warmup_steps + 1, 1_000_000),
        ) if cfg.lr_scheduler == "cosine" else cfg.lr
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.gradient_clip),
            optax.adamw(schedule, b1=0.9, b2=0.95, weight_decay=1e-4),
        )
        if cfg.gradient_accumulation_steps > 1:
            # reference: accelerator.accumulate context (train_DiT.py)
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=cfg.gradient_accumulation_steps
            )

    # ------------------------------------------------------------------ fsdp

    def fsdp_shardings(self, tree):
        """ZeRO/FSDP (+ optional tensor-parallel) sharding tree.

        * 'data' axis: every leaf shards its first mesh-divisible dim —
          ZeRO-style; at the dit preset (~1.7B params) adam moments alone
          are 13.6GB f32, far past one chip.
        * 'model' axis (when the mesh has one): Megatron-style TP on the
          transformer blocks — qkv and FFN-in kernels shard their OUTPUT
          features, out-proj and FFN-out kernels their INPUT features, so
          each block runs one all-reduce per sublayer.

        Applied to params AND optimizer state; XLA/GSPMD inserts the
        collectives (safe here: no Pallas in the DiT graph, unlike the
        renderer)."""
        import jax.tree_util as jtu
        from jax.sharding import NamedSharding, PartitionSpec as P

        sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        data_ax = self.cfg.mesh_axes[0]
        n_data = sizes.get(data_ax, 1)
        n_model = sizes.get("model", 1)

        def names(path):
            out = []
            for k in path:
                for attr in ("key", "name", "idx"):
                    if hasattr(k, attr):
                        out.append(str(getattr(k, attr)))
                        break
            return out

        def leaf(path, x):
            shape = tuple(getattr(x, "shape", ()))
            spec = [None] * len(shape)
            ns = names(path)
            is_kernel = ns and ns[-1] == "kernel"
            is_bias = ns and ns[-1] == "bias"
            col = any(n in ("to_q", "to_k", "to_v") for n in ns) or (
                "ff" in ns and "Dense_0" in ns
            )
            row = "to_out" in ns or ("ff" in ns and "Dense_1" in ns)
            if n_model > 1 and shape:
                if col and is_kernel and shape[-1] % n_model == 0:
                    spec[-1] = "model"
                elif col and is_bias and shape[0] % n_model == 0:
                    spec[0] = "model"
                elif row and is_kernel and shape[0] % n_model == 0:
                    spec[0] = "model"
            for d, s in enumerate(shape):
                if spec[d] is None and s % n_data == 0 and s >= n_data:
                    spec[d] = data_ax
                    break
            return NamedSharding(self.mesh, P(*spec))

        return jtu.tree_map_with_path(leaf, tree)

    # ------------------------------------------------------------------ init

    def init_state(self, key: jax.Array) -> DiTTrainState:
        cfg = self.cfg
        latent = jnp.zeros(
            (1, cfg.in_channels, cfg.sample_height, cfg.sample_width)
        )
        # any conditioning spatial size initializes the same conv params —
        # token count is data-dependent (no learned positions on cond tokens)
        cond = jnp.zeros((1, cfg.text_embed_dim, 16, 16))
        t = jnp.zeros((1,), jnp.int32)
        if self.spmd == "fsdp":
            p_shape = jax.eval_shape(self.model.init, key, latent, cond, t)
            p_sh = self.fsdp_shardings(p_shape)
            params = jax.jit(self.model.init, out_shardings=p_sh)(
                key, latent, cond, t
            )
            o_sh = self.fsdp_shardings(jax.eval_shape(self.tx.init, p_shape))
            opt = jax.jit(self.tx.init, out_shardings=o_sh)(params)
            return DiTTrainState(params, opt, jnp.zeros((), jnp.int32))
        params = jax.jit(self.model.init)(key, latent, cond, t)
        return DiTTrainState(params, self.tx.init(params),
                             jnp.zeros((), jnp.int32))

    # --------------------------------------------------------------- encode

    def encode_inputs(self, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        """Frozen VAE latent + frozen conditioning features
        (train_DiT.py:100-124).

        Pre-encoded fast path: a batch carrying ``latent`` [B,C,h,w] (already
        VAE-scaled) and ``cond`` [B,D,h',w'] skips the frozen VAE/encoder
        forwards entirely — for latent-caching input pipelines and for
        benching the DiT step in isolation."""
        cfg = self.cfg
        if "latent" in batch and "cond" in batch:
            # A batch must be EITHER pre-encoded or raw — carrying both
            # would silently skip the frozen VAE/encoder forwards on data
            # that was never VAE-scaled (advisor r4).
            assert "input" not in batch and "sapiens_input" not in batch, (
                "batch carries both pre-encoded ('latent'/'cond') and raw "
                "('input'/'sapiens_input') keys; drop one set — the "
                "pre-encoded fast path expects latents already scaled by "
                "vae_scaling_factor")
            return (jax.lax.stop_gradient(batch["latent"]),
                    jax.lax.stop_gradient(batch["cond"]))
        posterior = self.vae.apply(
            self.vae_params, batch["input"], batch["UV_inital"],
            method=VAEModel.encode,
        )
        latent = posterior.sample(rng)            # [B,h,w,C]
        latent = jnp.moveaxis(latent, -1, 1) * cfg.vae_scaling_factor
        cond = self.encoder.apply(
            self.encoder_params, batch["sapiens_input"]
        )
        return jax.lax.stop_gradient(latent), jax.lax.stop_gradient(cond)

    # ------------------------------------------------------------ train step

    # state donated: ~1.7B params + adam moments at the dit preset — old
    # and new state must not be live together. Callers rebind.
    @functools.partial(jax.jit, static_argnames=("self",), donate_argnums=(1,))
    def train_step(self, state: DiTTrainState, batch, rng: jax.Array):
        """SPMD: shard_map by default (explicit pmean DP, like VAETrainer);
        spmd='fsdp' runs the same local step under GSPMD with params +
        optimizer state sharded over the data axis (fsdp_shardings) — batch
        comes in data-sharded, XLA inserts the all-gather/reduce-scatter."""
        from jax.sharding import PartitionSpec as P

        axis = self.cfg.mesh_axes[0]
        if self.spmd != "shard_map":
            # fsdp/local: global-semantics program, no manual collectives;
            # sharding (if any) is carried by the input arrays + donation
            return self._local_train_step(state, batch, rng)
        fn = jax.shard_map(
            self._local_train_step, mesh=self.mesh,
            in_specs=(P(), P(axis), P()), out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(state, batch, rng)

    def _local_train_step(self, state: DiTTrainState, batch, rng: jax.Array):
        cfg = self.cfg
        if self.spmd == "shard_map":
            rng = jax.random.fold_in(
                rng, jax.lax.axis_index(cfg.mesh_axes[0])
            )
        k_enc, k_t, k_noise, k_drop = jax.random.split(rng, 4)
        latent, cond = self.encode_inputs(batch, k_enc)
        B = latent.shape[0]

        t = jax.random.randint(k_t, (B,), 0, cfg.num_train_timesteps)
        noise = jax.random.normal(k_noise, latent.shape)
        noisy = self.scheduler.add_noise(latent, noise, t)

        # conditioning dropout for CFG (train_DiT.py:120-121)
        drop = jax.random.bernoulli(
            k_drop, cfg.noised_condition_dropout, (B, 1, 1, 1)
        )
        cond = jnp.where(drop, 0.0, cond)

        weights = self.scheduler.snr_weights(t).reshape(B, 1, 1, 1)

        use_bf16 = cfg.mixed_precision == "bf16"

        def cast(p):
            if not use_bf16:
                return p
            return jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, p
            )

        def loss_fn(params):
            v_pred = self.model.apply(
                cast(params),
                noisy.astype(jnp.bfloat16 if use_bf16 else jnp.float32),
                cond.astype(jnp.bfloat16 if use_bf16 else jnp.float32), t,
            ).astype(jnp.float32)
            # recovered x0 from predicted v vs true latent
            a = self.scheduler.alphas_cumprod[t].reshape(B, 1, 1, 1)
            x0_pred = jnp.sqrt(a) * noisy - jnp.sqrt(1 - a) * v_pred
            loss = jnp.mean(weights * (x0_pred - latent) ** 2)
            return loss, {"loss": loss}

        grads, logs = jax.grad(loss_fn, has_aux=True)(state.params)
        if self.spmd == "shard_map":
            grads = jax.lax.pmean(grads, cfg.mesh_axes[0])
            logs = jax.lax.pmean(logs, cfg.mesh_axes[0])
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return DiTTrainState(params, opt_state, state.step + 1), logs

    # ------------------------------------------------------------------ eval

    @functools.partial(jax.jit, static_argnames=("self",))
    def eval_loss(self, state: DiTTrainState, batch, rng: jax.Array):
        """Held-out v-prediction loss at fixed mid-schedule timesteps
        (the trainer-side counterpart of the reference's periodic eval,
        train_DiT.py:470-557)."""
        cfg = self.cfg
        latent, cond = self.encode_inputs(batch, rng)
        B = latent.shape[0]
        t = jnp.full((B,), cfg.num_train_timesteps // 2, jnp.int32)
        noise = jax.random.normal(jax.random.fold_in(rng, 1), latent.shape)
        noisy = self.scheduler.add_noise(latent, noise, t)
        v_pred = self.model.apply(state.params, noisy, cond, t)
        a = self.scheduler.alphas_cumprod[t].reshape(B, 1, 1, 1)
        x0_pred = jnp.sqrt(a) * noisy - jnp.sqrt(1 - a) * v_pred
        w = self.scheduler.snr_weights(t).reshape(B, 1, 1, 1)
        return jnp.mean(w * (x0_pred - latent) ** 2)

    # ------------------------------------------------------------------ fit

    def fit(self, train_loader, state: DiTTrainState,
            num_steps: Optional[int] = None, log_every: int = 10,
            ckpt_path: Optional[str] = None, logger=None,
            eval_loader=None, eval_every: Optional[int] = None,
            profile_dir: Optional[str] = None, profile_every: int = 500):
        from sigman_release_tpu.utils.profiling import StepTimer, trace_if

        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed + 7 + jax.process_index())
        step = int(state.step)
        timer = StepTimer()
        done = False
        while not done:
            # device_put one batch ahead: the H2D copy overlaps the
            # previous step's compute (parallel/mesh.prefetch_to_device)
            for sharded in prefetch_to_device(train_loader, self.mesh):
                if num_steps is not None and step >= num_steps:
                    done = True
                    break
                key, sub = jax.random.split(key)
                with trace_if(profile_dir, step, every=profile_every,
                              enabled=profile_dir is not None):
                    state, logs = self.train_step(state, sharded, sub)
                    if profile_dir and step % profile_every == 0 and step:
                        jax.block_until_ready(state.params)
                timer.tick()
                step += 1
                if step % log_every == 0 and jax.process_index() == 0:
                    summ = timer.summary()
                    dt = summ.get("step_time_mean_s", 0.0)
                    print(f"[dit] step {step} "
                          f"loss {float(logs['loss']):.4f} ({dt:.2f}s/step)", flush=True)
                    if logger is not None:
                        logger.log(step, {"loss": float(logs["loss"]),
                                          **summ})
                if ckpt_path and step % cfg.save_ckpt_steps == 0:
                    save_checkpoint(ckpt_path, state)
                if (eval_loader is not None and eval_every
                        and step % eval_every == 0):
                    losses, first_eb = [], None
                    for i, eb in enumerate(eval_loader):
                        if i >= 4:
                            break
                        if first_eb is None:
                            first_eb = eb
                        losses.append(float(self.eval_loss(
                            state, shard_batch(eb, self.mesh), key
                        )))
                    ev_logs = {}
                    if losses:
                        ev_logs["eval_loss"] = float(np.mean(losses))
                    if self.latent_renderer is not None and first_eb is not None:
                        ev_logs.update(self.sample_eval(
                            state, first_eb, key,
                            vis_path=(f"{cfg.workspace}/dit_sample_"
                                      f"{step:07d}.png"
                                      if jax.process_index() == 0 else None),
                        ))
                    if ev_logs and jax.process_index() == 0:
                        print(f"[dit] eval @ {step}: {ev_logs}", flush=True)
                        if logger is not None:
                            logger.log(step, ev_logs)
            if num_steps is None:
                done = True
        if ckpt_path:
            save_checkpoint(ckpt_path, state)
        return state

    def resume(self, state: DiTTrainState, path: str) -> DiTTrainState:
        # reference torch safetensors resume straight into params (the
        # reference's own resume flow, train_vae.py:59-75) — optimizer
        # state/step stay fresh; msgpack restores the full train state
        if sniff_format(path) == "safetensors":
            return state._replace(
                params=load_params_any(path, state.params, self.cfg))
        loaded = load_checkpoint(path)
        if isinstance(loaded, dict) and "step" not in loaded:
            # bare params tree (e.g. converter --out): params-only resume
            return state._replace(
                params=tolerant_restore(state.params, loaded))
        return tolerant_restore(state, loaded)

    # -------------------------------------------------------------- sampling

    def sample_eval(self, state: DiTTrainState, batch, key: jax.Array,
                    vis_path: Optional[str] = None) -> Dict[str, float]:
        """Generate avatars from held-out conditioning images and render them
        against GT: image -> CFG DDIM sampling -> frozen-VAE decode ->
        deform -> rasterize -> PSNR + optional GT|sample grid (the reference's
        periodic SamplesPipeline eval, train_DiT.py:417-457,470-544)."""
        from sigman_release_tpu.losses.metrics import psnr

        cfg = self.cfg
        latents = self.sample(state, jnp.asarray(batch["sapiens_input"]), key)
        z = jnp.moveaxis(latents / cfg.vae_scaling_factor, 1, -1)
        arrays = {k: jnp.asarray(v) for k, v in batch.items()
                  if hasattr(v, "dtype") and np.issubdtype(
                      np.asarray(v).dtype, np.number)}
        outputs = self.latent_renderer(z, arrays)
        logs = {
            "sample_psnr": float(psnr(outputs["images_pred"],
                                      outputs["images_gt"])),
        }
        if vis_path is not None:
            from sigman_release_tpu.utils.visualize import save_visualization

            save_visualization(jax.tree.map(np.asarray, outputs), vis_path)
        return logs

    def sample(self, state: DiTTrainState, cond_images: jnp.ndarray,
               key: jax.Array, num_inference_steps: Optional[int] = None):
        """cond_images [B,3,H,W] -> latents [B,C,h,w] (decoded by caller)."""
        cond = self.encoder.apply(self.encoder_params, cond_images)
        use_bf16 = self.cfg.mixed_precision == "bf16"

        def dit_apply(params, lat, c, t):
            # activations must match the (bf16) params: f32 latents against
            # bf16 kernels promote EVERY matmul to f32 — ~3x MXU passes.
            # The scheduler step stays f32 (v cast back on the way out),
            # mirroring the train step's cast discipline above.
            if use_bf16:
                lat = lat.astype(jnp.bfloat16)
                c = c.astype(jnp.bfloat16)
            return self.model.apply(params, lat, c, t).astype(jnp.float32)

        return self.pipeline.sample_latents(
            dit_apply, state.params, cond, key,
            num_inference_steps=(num_inference_steps
                                 or self.cfg.num_inference_steps),
            guidance_scale=self.cfg.guidance_scale,
        )
