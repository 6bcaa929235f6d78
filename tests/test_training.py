"""End-to-end training smoke tests (tiny config, CPU, interpret-mode Pallas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigman_release_tpu.config import PRESETS
from sigman_release_tpu.data import DataLoader, SyntheticAvatarDataset
from sigman_release_tpu.parallel.mesh import make_mesh, shard_batch
from sigman_release_tpu.training.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    tolerant_restore,
)
from sigman_release_tpu.training.vae_trainer import VAETrainer

CFG = PRESETS["test_tiny"].replace(num_views=2, num_input_views=2)


@pytest.fixture(scope="module")
def trainer():
    return VAETrainer(CFG, interpret=True, mesh=make_mesh((1,), ("data",)))


@pytest.fixture(scope="module")
def batch():
    ds = SyntheticAvatarDataset(CFG, n_items=1)
    loader = DataLoader(ds, batch_size=1, shuffle=False, num_workers=1)
    return next(iter(loader))


def test_vae_train_step_runs_and_updates(trainer, batch):
    key = jax.random.PRNGKey(0)
    state, lpips_params = trainer.init_state(key)
    sharded = shard_batch(batch, trainer.mesh)
    before = np.asarray(jax.tree.leaves(state.params)[0]).copy()  # donated
    new_state, logs = trainer.train_step_g(state, sharded, lpips_params, key)
    assert int(new_state.step) == 1
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["L1"]) > 0
    # parameters actually moved
    after = jax.tree.leaves(new_state.params)[0]
    assert np.abs(np.asarray(after) - before).max() > 0


def test_vae_disc_step(trainer, batch):
    key = jax.random.PRNGKey(0)
    state, _ = trainer.init_state(key)
    sharded = shard_batch(batch, trainer.mesh)
    b = np.asarray(jax.tree.leaves(state.params)[0]).copy()  # donated
    new_state, logs = trainer.train_step_d(state, sharded, key)
    assert np.isfinite(float(logs["GAN_D"]))
    # generator untouched by D step
    a = jax.tree.leaves(new_state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), b)


def test_gradient_accumulation(batch):
    """k micro-steps with MultiSteps == one step on the averaged gradient:
    params only move on the k-th call (reference accelerator.accumulate,
    train_vae.py:133)."""
    cfg = CFG.replace(gradient_accumulation_steps=2, lambda_lpips=0.0)
    tr = VAETrainer(cfg, interpret=True, mesh=make_mesh((1,), ("data",)))
    key = jax.random.PRNGKey(0)
    state, lpips_params = tr.init_state(key)
    sharded = shard_batch(batch, tr.mesh)
    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()  # state donated
    s1, _ = tr.train_step_g(state, sharded, lpips_params, key)
    p1 = jax.tree.leaves(s1.params)[0]
    np.testing.assert_array_equal(np.asarray(p1), p0)  # buffered
    s2, _ = tr.train_step_g(s1, sharded, lpips_params, key)
    p2 = jax.tree.leaves(s2.params)[0]
    assert np.abs(np.asarray(p2) - p0).max() > 0  # applied on k-th


def test_checkpoint_roundtrip(tmp_path, trainer):
    key = jax.random.PRNGKey(0)
    state, _ = trainer.init_state(key)
    path = str(tmp_path / "state.msgpack")
    save_checkpoint(path, state)
    merged = tolerant_restore(state, load_checkpoint(path), verbose=False)
    assert type(merged) is type(state)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tolerant_restore_shape_mismatch():
    target = {"a": np.zeros((2, 2)), "b": np.zeros(3)}
    loaded = {"a": np.ones((2, 2)), "b": np.ones(4)}
    out = tolerant_restore(target, loaded, verbose=False)
    np.testing.assert_array_equal(out["a"], 1.0)
    np.testing.assert_array_equal(out["b"], 0.0)  # kept init


@pytest.mark.slow
def test_multidevice_dp_step(batch):
    """Full shard_map train step over a multi-device data mesh.

    Mesh width clamps to the CPU core count: the CPU backend's collective
    rendezvous blocks executor threads, so virtual device programs beyond
    the core count starve (see __graft_entry__.dryrun_multichip).
    """
    import os

    n = min(jax.device_count(), os.cpu_count() or 1, 4)
    assert n >= 2, "need at least 2 devices/cores for a DP test"
    mesh = make_mesh((n,), ("data",))
    cfg = CFG.replace(batch_size=n, lambda_lpips=0.0)
    tr = VAETrainer(cfg, interpret=True, mesh=mesh)
    key = jax.random.PRNGKey(0)
    state, lpips_params = tr.init_state(key)
    big = {k: (np.repeat(v, n, axis=0) if isinstance(v, np.ndarray) else v)
           for k, v in batch.items()}
    sharded = shard_batch(big, mesh)
    new_state, logs = tr.train_step_g(state, sharded, lpips_params, key)
    assert np.isfinite(float(logs["loss"]))
    # updated params are replicated (same on all devices)
    leaf = jax.tree.leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_eval_step_full_metric_set(trainer, batch):
    """Posterior-mode eval returns the reference's full metric set
    (PSNR/masked-PSNR/SSIM/LPIPS, core/loss/eval.py:67-84), pmean'd over
    the data axis (identical on every shard), and is deterministic."""
    key = jax.random.PRNGKey(0)
    state, lpips_params = trainer.init_state(key)
    sharded = shard_batch(batch, trainer.mesh)
    m1, outputs = trainer.eval_step(state, sharded, lpips_params, key)
    m2, _ = trainer.eval_step(state, sharded, lpips_params,
                              jax.random.PRNGKey(123))
    for k in ("psnr", "masked_psnr", "ssim", "lpips"):
        assert np.isfinite(float(m1[k])), k
        # posterior-MODE decode: metrics must not depend on the rng
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5)
    assert "overflow" not in outputs
    assert outputs["images_pred"].shape == outputs["images_gt"].shape


def test_view_sharded_step_matches_dp(batch):
    """Render-view sharding (mesh ('data','view')) must produce the same
    loss/gradient step as the pure-DP mesh: each shard rasterizes its views
    against replicated Gaussians and grads pmean over both axes."""
    from flax.traverse_util import flatten_dict

    key = jax.random.PRNGKey(0)
    t_dp = VAETrainer(CFG, interpret=True, mesh=make_mesh((1,), ("data",)))
    t_vs = VAETrainer(CFG, interpret=True,
                      mesh=make_mesh((1, 2), ("data", "view")))
    s0, lp = t_dp.init_state(key)

    def clone(st):
        return jax.tree.map(lambda x: jnp.array(x), st)  # states are donated

    s_dp, logs_dp = t_dp.train_step_g(clone(s0), shard_batch(batch, t_dp.mesh),
                                      lp, key)
    s_vs, logs_vs = t_vs.train_step_g(clone(s0), shard_batch(batch, t_vs.mesh),
                                      lp, key)
    # rng folding differs per topology -> the sampled latent differs; pin it
    # by comparing the deterministic D step instead? No: G uses posterior
    # sampling. Compare on a posterior-mode eval + D step (deterministic).
    m_dp, _ = t_dp.eval_step(s0, shard_batch(batch, t_dp.mesh), lp, key)
    m_vs, _ = t_vs.eval_step(s0, shard_batch(batch, t_vs.mesh), lp, key)
    for k in ("psnr", "ssim", "lpips"):
        np.testing.assert_allclose(float(m_dp[k]), float(m_vs[k]),
                                   rtol=2e-3, err_msg=k)

    sd_dp, logs_d_dp = t_dp.train_step_d(clone(s0),
                                         shard_batch(batch, t_dp.mesh), key)
    sd_vs, logs_d_vs = t_vs.train_step_d(clone(s0),
                                         shard_batch(batch, t_vs.mesh), key)
    np.testing.assert_allclose(float(logs_d_dp["GAN_D"]),
                               float(logs_d_vs["GAN_D"]), rtol=2e-3)
    a = flatten_dict(sd_dp.disc_params)
    b = flatten_dict(sd_vs.disc_params)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   atol=1e-5, rtol=1e-3)
