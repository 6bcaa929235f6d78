"""Entry-point smoke tests: the actual train_vae.py / train_DiT.py mains.

These guard the CLI wiring (eval loaders, latent renderer, spmd selection,
checkpoint paths) — unit tests exercise the trainers but not the scripts.
Tiny synthetic configs, a couple of steps each.
"""

import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _run_main(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [module.__name__] + argv)
    module.main()


@pytest.mark.slow
def test_train_vae_main_smoke(tmp_path, monkeypatch):
    import train_vae

    ws = str(tmp_path / "ws")
    _run_main(train_vae, [
        "test_tiny", "--num_epochs", "1", "--synthetic_data", "true",
        "--synthetic_items", "2", "--batch_size", "1", "--num_views", "2",
        "--num_input_views", "2", "--workspace", ws, "--log_every", "1",
        "--save_ckpt_steps", "2", "--eval_steps", "2", "--num_workers", "1",
        "--mesh_shape", "1",
    ], monkeypatch)
    assert os.path.exists(os.path.join(ws, "vae_state.msgpack"))
    # eval logged the full metric set
    logs = open(os.path.join(ws, "vae_metrics.jsonl")).read() \
        if os.path.exists(os.path.join(ws, "vae_metrics.jsonl")) else ""
    assert "eval_psnr" in logs or "psnr" in logs


@pytest.mark.slow
def test_train_dit_main_smoke(tmp_path, monkeypatch):
    import train_DiT

    ws = str(tmp_path / "ws_dit")
    _run_main(train_DiT, [
        "test_tiny", "--num_epochs", "1", "--synthetic_data", "true",
        "--synthetic_items", "2", "--batch_size", "1", "--num_views", "2",
        "--num_input_views", "2", "--workspace", ws, "--log_every", "1",
        "--save_ckpt_steps", "2", "--eval_steps", "2", "--num_workers", "1",
        "--num_inference_steps", "2", "--mesh_shape", "1",
    ], monkeypatch)
    assert os.path.exists(os.path.join(ws, "dit_state.msgpack"))
    # the sampling eval ran end-to-end: a GT|sample grid was dumped
    pngs = [f for f in os.listdir(ws) if f.startswith("dit_sample_")]
    assert pngs, f"no sampling-eval grids in {os.listdir(ws)}"
