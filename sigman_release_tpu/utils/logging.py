"""Training metrics logging: stdout + JSONL + optional wandb.

Replaces the reference's wandb-only logging (train_vae.py:43-45,177-188) with
a backend that always works offline: metrics stream to
``<workspace>/metrics.jsonl`` (one JSON object per line, with step and
wall-clock) and mirror to wandb when the package + login are available.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, workspace: str, name: str = "run",
                 use_wandb: bool = False, config: Optional[Dict] = None):
        os.makedirs(workspace, exist_ok=True)
        self.path = os.path.join(workspace, f"{name}_metrics.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project="sigman-tpu", name=name,
                                         config=config or {})
            except Exception as e:  # offline image: fall back silently
                print(f"[log] wandb unavailable ({e}); JSONL only")

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        row = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        row.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(row) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def summary(self, metrics: Dict[str, Any]) -> None:
        self.log(-1, metrics)

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
