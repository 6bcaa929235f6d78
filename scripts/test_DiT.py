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


def load_pose(path: str) -> np.ndarray:
    """demo/poses npz -> 175-d AMASS-layout vector
    (/root/reference/scripts/test_DiT.py:121-138)."""
    d = np.load(path)
    parts = [d["global_orient"], d["body_pose"], d["left_hand_pose"],
             d["right_hand_pose"], d["jaw_pose"], d["leye_pose"],
             d["reye_pose"], d["betas"]]
    return np.concatenate(
        [np.asarray(p, np.float32).reshape(1, -1) for p in parts], axis=-1
    )


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
    args = ap.parse_args()

    cfg = PRESETS[args.preset]
    key = jax.random.PRNGKey(0)

    # models
    vae_trainer = VAETrainer(
        cfg, interpret=jax.devices()[0].platform == "cpu"
    )
    state, _ = vae_trainer.init_state(key)
    if args.vae_ckpt:
        state = vae_trainer.resume(state, args.vae_ckpt)

    import cv2

    from sigman_release_tpu.models.encoders import ViTFeatureEncoder

    encoder = ViTFeatureEncoder(embed_dim=cfg.text_embed_dim)
    enc_params = encoder.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 3, 256, 256)))
    dit_trainer = DiTTrainer(cfg, vae_params=state.params,
                             encoder_params=enc_params)
    dit_state = dit_trainer.init_state(jax.random.PRNGKey(2))
    if args.dit_ckpt:
        dit_state = dit_trainer.resume(dit_state, args.dit_ckpt)

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

    smpl_vec = jnp.asarray(load_pose(args.pose_path))
    posed = vae_trainer.deformer.prepare(
        vae_trainer.deformer_state, parse_param_vector(smpl_vec)
    )
    defm, tfs = vae_trainer.deformer(vae_trainer.deformer_state, posed, canon)
    R_def = compose_rotations(attrs["rot"], t.init_rot, tfs)

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
