#!/usr/bin/env python
"""Offline UV-texture baking over a dataset of items.

Equivalent of the reference's proj_UV batch mode
(/root/reference/core/proj_UV/main.py:911-925 + runs.sh): for each item
directory (posed mesh + calibrated views), back-project the chosen views into
the SMPL-X UV atlas and write ``UV/smplxuv_albedo.png``. Failed items are
collected to ``wrong_id.npy`` like the reference.

    python scripts/bake_uv.py --items ./data/items.npy --start 0 --end 100
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# the reference's 18 baking views (main.py:416)
DEFAULT_VIEW_IDS = [30, 37, 45, 53, 65, 85, 0, 8, 82, 60, 15, 22, 70, 75,
                    40, 50, 5, 78]


def bake_item(item_dir: str, vert_uv: np.ndarray, faces: np.ndarray,
              verts: np.ndarray, view_ids, texture_size: int) -> str:
    import cv2

    from sigman_release_tpu.data.uv_baking import bake_uv_texture

    cam = json.load(open(os.path.join(item_dir,
                                      "camera_full_calibration.json")))
    K = np.array([[1100.0, 0, 512.0], [0, 1100.0, 512.0], [0, 0, 1.0]])
    images, w2cs = [], []
    for vid in view_ids:
        p = os.path.join(item_dir, "rgb_map", f"{vid:04d}.jpg")
        img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        if img is None:
            continue
        images.append(img[..., ::-1].astype(np.float32) / 255.0)
        pose = cam[f"{vid:04d}"]
        w2c = np.eye(4)
        w2c[:3, :3] = np.asarray(pose["R"])
        w2c[:3, 3] = np.asarray(pose["T"])
        w2cs.append(w2c)
    if not images:
        raise FileNotFoundError(f"no views in {item_dir}")

    tex = bake_uv_texture(
        verts, faces, vert_uv, np.stack(images), np.stack(w2cs), K,
        texture_size=texture_size,
    )
    out_dir = os.path.join(item_dir, "UV")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "smplxuv_albedo.png")
    cv2.imwrite(out, (tex[..., ::-1] * 255).astype(np.uint8))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", required=True,
                    help="npy list of item directories")
    ap.add_argument("--smplx", default=None, help="SMPLX model npz")
    ap.add_argument("--mesh_name", default="smplx_posed.obj",
                    help="per-item posed mesh (falls back to the canonical "
                         "body-model mesh when absent)")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=-1)
    ap.add_argument("--texture_size", type=int, default=1024)
    args = ap.parse_args()

    from sigman_release_tpu.body.smplx import (
        load_smplx_npz,
        synthetic_body_model,
        canonical_params,
        smplx_forward,
    )
    from sigman_release_tpu.body.subdivide import bake_template

    model = load_smplx_npz(args.smplx) if args.smplx else synthetic_body_model()
    template = bake_template(model)
    vert_uv = None
    # per-vertex UV from the template bake
    out = smplx_forward(model, canonical_params(1))
    verts = np.asarray(out.verts[0])
    faces = np.asarray(model.faces)
    # rebuild per-vertex uv by averaging face uvs
    vert_uv = np.zeros((verts.shape[0], 2), np.float32)
    cnt = np.zeros(verts.shape[0], np.float32)
    fuv = np.asarray(template.init_uv)
    tf = np.asarray(template.init_faces)
    for i in range(3):
        np.add.at(vert_uv, tf[:, i], fuv)
        np.add.at(cnt, tf[:, i], 1.0)
    vert_uv /= np.maximum(cnt[:, None], 1.0)

    items = [str(p) for p in np.load(args.items, allow_pickle=True)]
    end = len(items) if args.end < 0 else args.end
    wrong = []
    for item in items[args.start:end]:
        try:
            out_path = bake_item(item, vert_uv, faces, verts,
                                 DEFAULT_VIEW_IDS, args.texture_size)
            print(f"[bake_uv] {item} -> {out_path}")
        except Exception as e:  # collect failures like the reference
            print(f"[bake_uv] FAILED {item}: {e}")
            wrong.append(item)
    if wrong:
        np.save("wrong_id.npy", np.asarray(wrong))
        print(f"[bake_uv] {len(wrong)} failures -> wrong_id.npy")


if __name__ == "__main__":
    main()
