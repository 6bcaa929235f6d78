"""Training/eval visualization dumps: side-by-side GT | prediction grids.

Equivalent of the reference's periodic image dumps
(train_vae.py:236-254, train_DiT.py:141-173 save_visualization).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def save_visualization(outputs: Dict[str, np.ndarray], path: str,
                       max_views: int = 4) -> str:
    """outputs with images_pred/images_gt [B,V,3,H,W] -> one PNG grid.

    Rows: batch items; columns: per-view GT then prediction.
    """
    import cv2

    pred = np.asarray(outputs["images_pred"])
    gt = np.asarray(outputs["images_gt"])
    B, V = pred.shape[:2]
    V = min(V, max_views)
    rows = []
    for b in range(B):
        cells = []
        for v in range(V):
            cells.append(gt[b, v].transpose(1, 2, 0))
            cells.append(pred[b, v].transpose(1, 2, 0))
        rows.append(np.concatenate(cells, axis=1))
    grid = np.concatenate(rows, axis=0)
    grid = np.clip(grid, 0.0, 1.0)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, (grid[..., ::-1] * 255).astype(np.uint8))
    return path
