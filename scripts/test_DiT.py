#!/usr/bin/env python
"""Image-to-avatar inference: image + pose -> DiT sampling -> VAE decode ->
20-view splat render.

Equivalent of /root/reference/scripts/test_DiT.py inference() (:198-345):
loads a conditioning image and an SMPL-X pose npz (demo/poses layout), runs
the CFG DDIM loop, decodes the latent through the VAE heads, deforms to the
pose and renders the camera rig.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.config import PRESETS
from sigman_release_tpu.body.smplx import SMPLXParams
from sigman_release_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
from sigman_release_tpu.geometry.cameras import (
    camera_bundle,
    orbit_camera,
    projection_matrix,
)
from sigman_release_tpu.models.vae import compose_rotations, sample_gaussian_attrs
from sigman_release_tpu.training.dit_trainer import DiTTrainer
from sigman_release_tpu.training.vae_trainer import VAETrainer
from sigman_release_tpu.utils.ply import save_ply


# the reference's fixed 20-view evaluation rig
# (/root/reference/core/dataset/dataloader_test.py:61)
TEST_VIEW_IDS = [30, 37, 45, 53, 65, 85, 0, 6, 15, 24, 34, 41, 49, 57, 60,
                 68, 72, 75, 80, 83]

_SMPLX_KEYS = ("transl", "global_orient", "betas", "body_pose", "expression",
               "left_hand_pose", "right_hand_pose", "jaw_pose", "leye_pose",
               "reye_pose")


def load_pose(path: str, frame: int = 0) -> np.ndarray:
    """SMPL-X pose npz -> [1, 188] param vector in the reference's
    (transl, global_orient, betas, body_pose, expression, lhand, rhand,
    jaw, leye, reye) order. Handles the three reference layouts
    (/root/reference/scripts/test_DiT.py:100-166):

    * single pose (1-D per-key arrays),
    * pose sequences (leading time dim per key) — ``frame`` selects one,
    * AMASS exports (pose_body/pose_hand/... keys; betas ZEROED, matching
      the reference's load_amass quirk).
    """
    d = np.load(path, allow_pickle=True)
    if "pose_body" in d:  # AMASS layout
        T = d["pose_body"].shape[0]
        parts = [d["trans"], d["root_orient"], np.zeros((T, 10)),
                 d["pose_body"], np.zeros((T, 10)),
                 d["pose_hand"][:, :45], d["pose_hand"][:, 45:],
                 d["pose_jaw"], d["pose_eye"][:, :3], d["pose_eye"][:, 3:]]
        vec = np.concatenate(
            [np.asarray(p, np.float32).reshape(T, -1) for p in parts], -1
        )
        return vec[frame:frame + 1]
    betas = np.asarray(d["betas"])
    if betas.ndim == 2:  # sequence layout: pick one frame
        parts = [np.asarray(d[k], np.float32)[frame].reshape(1, -1)
                 for k in _SMPLX_KEYS]
    else:
        parts = [np.asarray(d[k], np.float32).reshape(1, -1)
                 for k in _SMPLX_KEYS]
    return np.concatenate(parts, axis=-1)


def load_camera_rig(camera_json: str, view_ids, znear, zfar):
    """Calibrated rig (K=1100 @1024^2 intrinsics, w2c R/T per view) —
    the rig the reference evaluates on (scripts/test_DiT.py:276-297)."""
    import json

    from sigman_release_tpu.geometry.cameras import (
        intrinsics_projection_matrix,
    )

    cams = json.load(open(camera_json))
    K = np.array([[1100.0, 0, 512.0], [0, 1100.0, 512.0], [0, 0, 1.0]])
    proj = intrinsics_projection_matrix(znear, zfar, K, 1024, 1024)
    w2cs = []
    for vid in view_ids:
        pose = cams[f"{vid:04d}"]
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.asarray(pose["R"], np.float32)
        w2c[:3, 3] = np.asarray(pose["T"], np.float32)
        w2cs.append(w2c)
    w2cs = np.stack(w2cs)
    cam_view = np.transpose(w2cs, (0, 2, 1)).astype(np.float32)
    cam_view_proj = (cam_view @ proj.T).astype(np.float32)
    return cam_view, cam_view_proj


def run_eval(args, cfg, vae_trainer, dit_trainer, state, dit_state,
             lpips_params):
    """Test-set generation metrics: per item, sample from the conditioning
    image, decode through the frozen VAE, render the GT views, and score
    PSNR/SSIM/LPIPS against them (reference scripts/test_DiT.py:347-478)."""
    import jax.numpy as jnp

    from sigman_release_tpu.data import (
        DataLoader, HGSDataset, SyntheticAvatarDataset,
    )
    from sigman_release_tpu.losses.metrics import psnr, ssim

    if cfg.synthetic_data:
        ds = SyntheticAvatarDataset(cfg, n_items=max(2, cfg.synthetic_items))
    else:
        ds = HGSDataset(cfg, training=False)
    loader = DataLoader(ds, cfg.batch_size, shuffle=False,
                        num_workers=cfg.num_workers, drop_last=False)
    os.makedirs(args.out_dir, exist_ok=True)
    sums = {}
    for i, batch in enumerate(loader):
        if i >= args.eval_batches:
            break
        lat = dit_trainer.sample(dit_state,
                                 jnp.asarray(batch["sapiens_input"]),
                                 jax.random.fold_in(jax.random.PRNGKey(7), i),
                                 num_inference_steps=args.steps)
        z = jnp.moveaxis(lat / cfg.vae_scaling_factor, 1, -1)
        arrays = {k: jnp.asarray(v) for k, v in batch.items()
                  if hasattr(v, "dtype")
                  and np.issubdtype(np.asarray(v).dtype, np.number)}
        out = vae_trainer.render_latent(state.params, z, arrays)
        if i < 4:
            from sigman_release_tpu.utils.visualize import save_visualization

            save_visualization(
                jax.tree.map(np.asarray, out),
                os.path.join(args.out_dir, f"eval_{i:03d}.png"),
            )
        pred = out["images_pred"]
        gt = out["images_gt"]
        fp = pred.reshape(-1, *pred.shape[2:])
        fg = gt.reshape(-1, *gt.shape[2:])
        vals = {
            "psnr": float(psnr(pred, gt)),
            "ssim": float(ssim(fp, fg)),
            "lpips": float(jnp.mean(vae_trainer.lpips.apply(
                lpips_params, fp * 2.0 - 1.0, fg * 2.0 - 1.0))),
        }
        for k, v in vals.items():
            sums.setdefault(k, []).append(v)
        print(f"[eval] batch {i}: " + "  ".join(
            f"{k} {v:.4f}" for k, v in vals.items()), flush=True)
    print("[eval] mean: " + "  ".join(
        f"{k} {np.mean(v):.4f}" for k, v in sums.items()) +
        f"  ({len(next(iter(sums.values()), []))} batches)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_path", default="/root/reference/demo/images/demo.jpg")
    ap.add_argument("--pose_path",
                    default="/root/reference/demo/poses/smplx_demo.npz")
    ap.add_argument("--preset", default="test_tiny")
    ap.add_argument("--vae_ckpt", default=None)
    ap.add_argument("--dit_ckpt", default=None)
    ap.add_argument("--out_dir", default="./workspace/inference")
    ap.add_argument("--num_views", type=int, default=4)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--frame", type=int, default=0,
                    help="frame for sequence/AMASS pose files")
    ap.add_argument("--camera_json", default=None,
                    help="90-camera calibration json; renders the fixed "
                         "20-view test rig instead of a synthetic orbit")
    ap.add_argument("--eval", action="store_true",
                    help="test-set metrics instead of single-image "
                         "inference (reference scripts/test_DiT.py eval(), "
                         ":347-478)")
    ap.add_argument("--eval_batches", type=int, default=16)
    args = ap.parse_args()

    cfg = PRESETS[args.preset]
    key = jax.random.PRNGKey(0)

    # models
    vae_trainer = VAETrainer(
        cfg, interpret=jax.devices()[0].platform == "cpu"
    )
    state, lpips_params = vae_trainer.init_state(key)
    if args.vae_ckpt:
        state = vae_trainer.resume(state, args.vae_ckpt)

    import cv2

    from sigman_release_tpu.models.encoders import ViTFeatureEncoder

    encoder = ViTFeatureEncoder(embed_dim=cfg.text_embed_dim)
    enc_params = encoder.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 3, 256, 256)))
    dit_trainer = DiTTrainer(
        cfg, vae_params=state.params, encoder_params=enc_params,
        latent_renderer=lambda z, b: vae_trainer.render_latent(
            state.params, z, b
        ),
    )
    dit_state = dit_trainer.init_state(jax.random.PRNGKey(2))
    if args.dit_ckpt:
        dit_state = dit_trainer.resume(dit_state, args.dit_ckpt)

    if args.eval:
        return run_eval(args, cfg, vae_trainer, dit_trainer, state,
                        dit_state, lpips_params)

    # condition image
    img = cv2.imread(args.image_path, cv2.IMREAD_UNCHANGED)
    img = cv2.resize(img, (cfg.input_size, cfg.input_size)).astype(
        np.float32
    )[..., [2, 1, 0]] / 255.0
    img = ((img - IMAGENET_MEAN) / IMAGENET_STD).transpose(2, 0, 1)[None]

    # sample latents
    latents = dit_trainer.sample(
        dit_state, jnp.asarray(img), jax.random.PRNGKey(3),
        num_inference_steps=args.steps,
    )

    # decode latents -> gaussian attribute map -> deform -> render
    t = vae_trainer.template
    z = jnp.moveaxis(latents, 1, -1)
    attr_map = vae_trainer.model.apply(
        state.params, z, method=type(vae_trainer.model).decode
    )
    attrs = sample_gaussian_attrs(attr_map, t.init_uv)
    canon = t.init_pcd[None] + attrs["offset"]

    from sigman_release_tpu.body.smplx import parse_param_vector

    smpl_vec = jnp.asarray(load_pose(args.pose_path, frame=args.frame))
    posed = vae_trainer.deformer.prepare(
        vae_trainer.deformer_state, parse_param_vector(smpl_vec)
    )
    defm, tfs = vae_trainer.deformer(vae_trainer.deformer_state, posed, canon)
    R_def = compose_rotations(attrs["rot"], t.init_rot, tfs)

    if args.camera_json and os.path.exists(args.camera_json):
        cv, cvp = load_camera_rig(args.camera_json, TEST_VIEW_IDS,
                                  cfg.znear, cfg.zfar)
    else:
        print("[test_DiT] no --camera_json: synthesizing an orbit rig "
              "(the reference renders the calibrated 20-view rig)")
        proj = projection_matrix(cfg.znear, cfg.zfar, cfg.fovx, cfg.fovy)
        c2ws = np.stack([
            orbit_camera(10.0, 360.0 * v / args.num_views, cfg.cam_radius)
            for v in range(args.num_views)
        ])
        cv, cvp, _ = camera_bundle(c2ws, proj)

    gaussians = {
        "position": defm, "opacity": attrs["opacity"],
        "scale": attrs["scale"], "cov3d": R_def, "rgb": attrs["rgb"],
    }
    out = vae_trainer.renderer.render(
        gaussians, jnp.asarray(cv)[None], jnp.asarray(cvp)[None]
    )

    os.makedirs(args.out_dir, exist_ok=True)
    imgs = np.asarray(out["image"][0])  # [V,3,H,W]
    for v in range(imgs.shape[0]):
        cv2.imwrite(
            os.path.join(args.out_dir, f"view_{v:02d}.png"),
            (imgs[v].transpose(1, 2, 0)[..., ::-1] * 255).astype(np.uint8),
        )
    # export splat ply (canonical scale convention: renderer applies knn base)
    n = defm.shape[1]
    quat = np.zeros((n, 4), np.float32)
    quat[:, 0] = 1.0
    g14 = np.concatenate(
        [np.asarray(defm[0]), np.asarray(attrs["opacity"][0]),
         np.abs(np.asarray(attrs["scale"][0])) * 0.01 + 0.003,
         quat, np.asarray(attrs["rgb"][0])], axis=1,
    )
    save_ply(g14, os.path.join(args.out_dir, "avatar.ply"))
    print(f"wrote {imgs.shape[0]} views + avatar.ply to {args.out_dir}")


if __name__ == "__main__":
    main()
