"""The converted-checkpoint chain as ONE flow (VERDICT r2 #4).

torch replica -> autoencoder.safetensors -> converter CLI (--out msgpack)
-> trainer resume (both formats) -> eval_step produces finite metrics,
mirroring the reference flow scripts/test_vae.py --resume on a reference
checkpoint (/root/reference/core/modules/DiT_utils.py:773-830).
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from sigman_release_tpu.config import PRESETS
from sigman_release_tpu.data import DataLoader, SyntheticAvatarDataset
from sigman_release_tpu.parallel.mesh import make_mesh, shard_batch
from sigman_release_tpu.training.checkpoint import (
    load_checkpoint,
    load_params_any,
    save_checkpoint,
    sniff_format,
)
from sigman_release_tpu.training.vae_trainer import VAETrainer

CFG = PRESETS["test_tiny"].replace(num_views=2, num_input_views=2)


def _write_reference_safetensors(path):
    import torch
    from safetensors.numpy import save_file

    from test_convert import _torch_vae_replica

    torch.manual_seed(0)
    tm = _torch_vae_replica(PRESETS["test_tiny"]).eval()
    sd = {k: np.ascontiguousarray(v.numpy())
          for k, v in tm.state_dict().items()}
    save_file(sd, path)
    return sd


def test_sniff_format(tmp_path):
    st = tmp_path / "ref.safetensors"
    _write_reference_safetensors(str(st))
    assert sniff_format(str(st)) == "safetensors"

    mp = tmp_path / "state.msgpack"
    save_checkpoint(str(mp), {"params": {"w": np.zeros((2, 2))}})
    assert sniff_format(str(mp)) == "msgpack"

    with pytest.raises(ValueError, match="safetensors"):
        load_checkpoint(str(st))


def test_safetensors_to_eval_flow(tmp_path):
    st_path = str(tmp_path / "autoencoder.safetensors")
    _write_reference_safetensors(st_path)

    # 1) the converter CLI writes a msgpack params file
    import convert_reference_ckpt as cli

    out_path = str(tmp_path / "vae_params.msgpack")
    argv = sys.argv
    sys.argv = ["convert_reference_ckpt.py", "--ckpt", st_path,
                "--preset", "test_tiny", "--out", out_path]
    try:
        cli.main()
    finally:
        sys.argv = argv
    assert os.path.exists(out_path)
    assert sniff_format(out_path) == "msgpack"

    # 2) resume accepts BOTH the converted msgpack and the raw safetensors
    trainer = VAETrainer(CFG, interpret=True,
                         mesh=make_mesh((1,), ("data",)))
    key = jax.random.PRNGKey(0)
    state, lpips_params = trainer.init_state(key)
    st_direct = trainer.resume(state, st_path)
    st_msgpack = trainer.resume(state, out_path)
    flat_a = jax.tree.leaves(st_direct.params)
    flat_b = jax.tree.leaves(st_msgpack.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the load actually changed the params (not a silent no-op restore)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params), flat_a)
    )
    assert changed

    # 3) eval on the resumed state produces finite metrics end to end
    ds = SyntheticAvatarDataset(CFG, n_items=1)
    batch = next(iter(DataLoader(ds, batch_size=1, shuffle=False,
                                 num_workers=1)))
    sharded = shard_batch(batch, trainer.mesh)
    metrics, _ = trainer.eval_step(st_direct, sharded, lpips_params, key)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_load_params_any_msgpack_bare_params(tmp_path):
    """A msgpack file holding bare variables restores into a variables
    target; one holding a full train state peels its params subtree."""
    trainer = VAETrainer(CFG, interpret=True,
                         mesh=make_mesh((1,), ("data",)))
    state, _ = trainer.init_state(jax.random.PRNGKey(1))

    bare = tmp_path / "bare.msgpack"
    save_checkpoint(str(bare), state.params)
    full = tmp_path / "full.msgpack"
    save_checkpoint(str(full), state)

    for p in (bare, full):
        restored = load_params_any(str(p), state.params, CFG, verbose=False)
        for a, b in zip(jax.tree.leaves(restored),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
