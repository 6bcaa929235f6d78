#!/usr/bin/env python
"""Prove the framework LEARNS: overfit one synthetic avatar end-to-end.

Every prior training artifact was a one-step timing (VERDICT r4 missing #1);
this script commits a multi-hundred-step loss/PSNR/overflow trajectory of the
full vae_b pipeline — encoder -> UV attribute map -> grid-sample -> LBS
deform -> Pallas rasterizer -> photometric losses -> custom-VJP gradients ->
AdamW — on the real chip, with alternating G/D steps once the discriminator
gates on (the reference's epoch-loop semantics, train_vae.py:126-348).

Protocol: a GROUND-TRUTH avatar that is exactly representable by the decoder
output space — a handcrafted 13-channel UV attribute map (smooth UV color
pattern, high opacity, zero offsets/rot deltas) rendered through the SAME
deform+rasterize path gives the target images; the encoder inputs are those
renders, ImageNet-normalized, concatenated with their Plücker ray maps (the
dataset's exact input assembly, data/dataset.py:170-205). PSNR climbing far
above the init render is end-to-end evidence that gradients through the
rasterizer custom VJP train, not merely match oracles on one call.

lr is raised above the preset's 3e-6 (a 64-GPU value) because a B=1
overfit at 3e-6 would need tens of thousands of steps to move; the artifact
records the lr used.

    python benchmarks/overfit_traj.py --steps 400 --out TRAJ_r05.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--verts", type=int, default=26000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--disc_start", type=int, default=200,
                    help="step at which the GAN gates on (G/D alternation "
                         "after this, reference train_vae.py:137-147)")
    ap.add_argument("--out", default="TRAJ_r05.json")
    ap.add_argument("--vis_dir", default="traj_vis")
    # the synthetic template's KNN base scales are large (PERF.md round 3);
    # the default capacity drops pairs even on the GT render — run the
    # overfit at the widened operating point the capacity study validated
    ap.add_argument("--pair_budget_factor", type=int, default=12)
    ap.add_argument("--big_win", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from sigman_release_tpu.config import PRESETS
    from sigman_release_tpu.body.smplx import synthetic_body_model
    from sigman_release_tpu.body.template import synthetic_template
    from sigman_release_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
    from sigman_release_tpu.geometry.cameras import (
        camera_bundle, orbit_camera, projection_matrix,
    )
    from sigman_release_tpu.geometry.rays import plucker_rays
    from sigman_release_tpu.parallel.mesh import make_mesh
    from sigman_release_tpu.training.vae_trainer import VAETrainer
    from sigman_release_tpu.utils.visualize import save_visualization

    cfg = PRESETS["vae_b"].replace(
        input_size=args.size, output_size=args.size,
        batch_size=1, lambda_lpips=1.0, lr=args.lr,
        disc_start=args.disc_start,
        # constant lr: the preset's 2000-step warmup would leave most of a
        # 400-step run at near-zero lr
        lr_scheduler="constant", lr_warmup_steps=0,
        pair_budget_factor=args.pair_budget_factor,
        render_big_win=args.big_win,
    )
    if args.size < 512:
        # CPU smoke path: the UV query grid must equal input_size/8
        # (ConvVAE encode concat); shrink the bottleneck accordingly
        q = args.size // 8
        cfg = cfg.replace(sample_height=q, sample_width=q, uv_query_size=q,
                          lpips_size=min(cfg.lpips_size, args.size))
    body = synthetic_body_model(n_verts=args.verts)
    template = synthetic_template(body)
    mesh = make_mesh((1,), ("data",))
    trainer = VAETrainer(cfg, body_model=body, template=template, mesh=mesh)
    n_gauss = int(template.init_pcd.shape[0])

    key = jax.random.PRNGKey(0)
    state, lpips_params = trainer.init_state(key)

    # ---- ground-truth avatar: a decoder-representable UV attribute map ----
    H = args.size
    uu, vv = np.meshgrid(np.linspace(0, 1, H, dtype=np.float32),
                         np.linspace(0, 1, H, dtype=np.float32),
                         indexing="xy")
    rgb = np.stack([
        0.5 + 0.45 * np.sin(2 * np.pi * (3 * uu + 0.5 * vv)),
        0.5 + 0.45 * np.cos(2 * np.pi * (2 * vv)),
        0.5 + 0.45 * np.sin(2 * np.pi * (uu + vv)),
    ], axis=-1)                                            # [H,W,3] in (0,1)
    attr_gt = np.concatenate([
        np.full((H, H, 1), 0.95, np.float32),              # opacity (sigmoid)
        np.zeros((H, H, 3), np.float32),                   # offset (raw)
        rgb.astype(np.float32),                            # rgb (sigmoid)
        # scale 0.25 -> pred -0.5 -> 0.5x the KNN base scale: the synthetic
        # template's base scales are atypically large and a full-scale GT
        # render overflows even widened capacity
        np.full((H, H, 3), 0.25, np.float32),
        np.full((H, H, 3), 0.5, np.float32),               # rot -> zero delta
    ], axis=-1)[None]                                      # [1,H,W,13]

    rng_np = np.random.default_rng(0)
    smpl_params = rng_np.normal(0, 0.1, (1, 175)).astype(np.float32)
    proj = projection_matrix(cfg.znear, cfg.zfar, cfg.fovx, cfg.fovy)
    c2ws = np.stack([
        orbit_camera(10.0, 360.0 * v / cfg.num_views, cfg.cam_radius)
        for v in range(cfg.num_views)
    ])
    cv, cvp, _ = camera_bundle(c2ws, proj)

    gt_batch = {
        "smpl_params": jnp.asarray(smpl_params),
        "cam_view": jnp.asarray(cv)[None],
        "cam_view_proj": jnp.asarray(cvp)[None],
        "images_output": jnp.zeros((1, cfg.num_views, 3, H, H)),
        "masks_output": jnp.ones((1, cfg.num_views, 1, H, H)),
    }
    gt = jax.jit(trainer._render_attrs)(jnp.asarray(attr_gt), gt_batch,
                                        trainer.deformer_state)
    images_gt = np.asarray(gt["images_pred"])              # [1,V,3,H,W]
    alphas_gt = np.asarray(gt["alphas_pred"])              # [1,V,1,H,W]
    assert float(gt["overflow"].sum()) == 0.0, (
        "GT render overflowed — widen capacity before trusting the target")

    # ---- encoder inputs: the dataset's exact assembly ----
    Vin = cfg.num_input_views
    norm = ((images_gt[0, :Vin].transpose(0, 2, 3, 1) - IMAGENET_MEAN)
            / IMAGENET_STD).transpose(0, 3, 1, 2)          # [Vin,3,H,H]
    rays = np.stack([
        np.asarray(plucker_rays(jnp.asarray(c2ws[v]), H, H, cfg.fovy))
        for v in range(Vin)
    ]).transpose(0, 3, 1, 2)                               # [Vin,6,H,H]
    batch = {
        "input": jnp.asarray(np.concatenate([norm, rays], axis=1))[None],
        "UV_inital": jnp.moveaxis(jnp.asarray(rgb), -1, 0)[None],
        "smpl_params": gt_batch["smpl_params"],
        "cam_view": gt_batch["cam_view"],
        "cam_view_proj": gt_batch["cam_view_proj"],
        "images_output": jnp.asarray(images_gt),
        "masks_output": jnp.asarray(alphas_gt > 0.5, jnp.float32),
    }

    # ---- init render (eval mode) + step-0 grid ----
    def eval_psnr(state):
        metrics, outputs = trainer.eval_step(state, batch, lpips_params, key)
        return ({k: float(v) for k, v in metrics.items()},
                jax.tree.map(np.asarray, outputs))

    m0, out0 = eval_psnr(state)
    os.makedirs(args.vis_dir, exist_ok=True)
    save_visualization(out0, os.path.join(args.vis_dir, "step_0000.png"))
    print(f"init eval: {m0}", flush=True)

    # ---- the trajectory: alternating G/D exactly like VAETrainer.fit ----
    traj = []
    t_start = time.time()
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        step = int(i)
        use_d = step >= cfg.disc_start and step % 2 == 1
        if use_d:
            state, logs = trainer.train_step_d(state, batch, sub)
            rec = {"step": step, "kind": "d",
                   "d_loss": float(logs["GAN_D"])}
        else:
            state, logs = trainer.train_step_g(state, batch, lpips_params,
                                               sub)
            rec = {"step": step, "kind": "g",
                   "loss": float(logs["loss"]),
                   "psnr": float(logs["psnr"]),
                   "overflow": float(logs["overflow"])}
        traj.append(rec)
        if step % 20 == 0:
            print(f"[{step}] {rec} ({(time.time()-t_start)/(i+1):.2f}s/step)",
                  flush=True)

    mN, outN = eval_psnr(state)
    save_visualization(outN, os.path.join(args.vis_dir,
                                          f"step_{args.steps:04d}.png"))
    g_psnrs = [r["psnr"] for r in traj if r["kind"] == "g"]
    result = {
        "workload": f"vae_b overfit B=1 V={cfg.num_views} {args.size}^2 "
                    f"N={n_gauss} lpips=random-vgg gan_from={args.disc_start}",
        "platform": jax.devices()[0].platform,
        "lr": args.lr,
        "steps": args.steps,
        "eval_init": m0,
        "eval_final": mN,
        "psnr_first_g_step": g_psnrs[0],
        "psnr_last_g_step": g_psnrs[-1],
        "psnr_gain_db": round(mN["psnr"] - m0["psnr"], 2),
        "wall_s": round(time.time() - t_start, 1),
        "trajectory": traj,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "trajectory"}, indent=1))


if __name__ == "__main__":
    main()
