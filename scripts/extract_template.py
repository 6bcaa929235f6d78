#!/usr/bin/env python
"""One-time template extraction (reference README steps, SURVEY.md #27).

    python scripts/extract_template.py --smplx ./assets/SMPLX_NEUTRAL.npz \
        --out ./assets/template [--seg ./assets/smplx_vert_segmentation.json]

Subdivides the configured regions (face/ears/eyes/hands when a segmentation
json is given) and writes the reference-compatible ``init_*_smplx_thu.npy``
set consumed by ``--template_dir``.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBDIVIDE_REGIONS = [
    "head", "leftEye", "rightEye", "leftEar", "rightEar",
    "leftHand", "rightHand", "leftHandIndex1", "rightHandIndex1",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smplx", default=None,
                    help="SMPLX_*.npz model (synthetic body if omitted)")
    ap.add_argument("--seg", default=None,
                    help="vertex segmentation json (region -> vertex ids)")
    ap.add_argument("--out", default="./assets/template")
    args = ap.parse_args()

    from sigman_release_tpu.body.smplx import load_smplx_npz, synthetic_body_model
    from sigman_release_tpu.body.subdivide import bake_template, save_template_dir

    model = (load_smplx_npz(args.smplx) if args.smplx
             else synthetic_body_model())

    regions = None
    if args.seg:
        seg = json.load(open(args.seg))
        regions = [seg[name] for name in SUBDIVIDE_REGIONS if name in seg]

    template = bake_template(model, subdivide_regions=regions)
    save_template_dir(template, args.out)
    print(f"baked {template.num_gaussians} gaussian anchors -> {args.out}")


if __name__ == "__main__":
    main()
