"""DiT trainer + sampling pipeline smoke tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigman_release_tpu.config import PRESETS
from sigman_release_tpu.models.encoders import ViTFeatureEncoder
from sigman_release_tpu.models.vae import VAEModel
from sigman_release_tpu.parallel.mesh import make_mesh, shard_batch
from sigman_release_tpu.training.dit_trainer import DiTTrainer

CFG = PRESETS["test_tiny"].replace(
    num_views=2, num_input_views=2, batch_size=1,
    num_layers=1, num_attention_heads=2, attention_head_dim=8,
    text_embed_dim=16, time_embed_dim=16,
    sample_height=8, sample_width=8,
    lr_scheduler="constant", lr=1e-3,  # warmup lr would be 0 at step 0
)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    vae = VAEModel(CFG)
    H, V = CFG.input_size, CFG.num_input_views
    vae_params = vae.init(
        {"params": key, "sample": key},
        jnp.zeros((1, V, 9, H, H)), jnp.zeros((1, 3, H, H)), key,
    )
    enc = ViTFeatureEncoder(embed_dim=CFG.text_embed_dim, depth=1, heads=2,
                            patch_size=16)
    enc_params = enc.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 64, 64)))
    trainer = DiTTrainer(CFG, vae_params=vae_params, encoder_params=enc_params,
                         mesh=make_mesh((1,), ("data",)))
    trainer.encoder = enc
    state = trainer.init_state(jax.random.PRNGKey(2))
    return trainer, state


def _batch():
    rng = np.random.default_rng(0)
    H, V = CFG.input_size, CFG.num_input_views
    return {
        "input": rng.normal(0, 1, (1, V, 9, H, H)).astype(np.float32),
        "UV_inital": rng.uniform(0, 1, (1, 3, H, H)).astype(np.float32),
        "sapiens_input": rng.normal(0, 1, (1, 3, H, H)).astype(np.float32),
    }


def test_dit_train_step(setup):
    trainer, state = setup
    sharded = shard_batch(_batch(), trainer.mesh)
    # train_step donates its state: feed it a clone, keep the original
    clone = jax.tree.map(jnp.array, state)
    a = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    new_state, logs = trainer.train_step(clone, sharded,
                                         jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["loss"]))
    assert int(new_state.step) == 1
    b = jax.tree.leaves(new_state.params)[0]
    assert np.abs(np.asarray(b) - a).max() > 0


def test_dit_sampling(setup):
    trainer, state = setup
    cond = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (1, 3, CFG.input_size,
                                               CFG.input_size)), jnp.float32)
    latents = trainer.sample(state, cond, jax.random.PRNGKey(3),
                             num_inference_steps=3)
    assert latents.shape == (1, CFG.latent_channels, CFG.sample_height,
                             CFG.sample_width)
    assert np.isfinite(np.asarray(latents)).all()


def test_cfg_changes_result(setup):
    trainer, state = setup
    cond = jnp.ones((1, 3, CFG.input_size, CFG.input_size))
    enc_cond = trainer.encoder.apply(trainer.encoder_params, cond)

    def dit_apply(params, lat, c, t):
        return trainer.model.apply(params, lat, c, t)

    k = jax.random.PRNGKey(0)
    l1 = trainer.pipeline.sample_latents(dit_apply, state.params, enc_cond, k,
                                         num_inference_steps=2,
                                         guidance_scale=1.0)
    l2 = trainer.pipeline.sample_latents(dit_apply, state.params, enc_cond, k,
                                         num_inference_steps=2,
                                         guidance_scale=5.0)
    assert np.abs(np.asarray(l1 - l2)).max() > 1e-6


def test_dit_sample_eval_renders_and_scores(setup, tmp_path):
    """In-training sampling eval: CFG pipeline -> frozen-VAE decode ->
    deform -> render -> PSNR + GT|sample grid (train_DiT.py:417-457)."""
    from sigman_release_tpu.data import DataLoader, SyntheticAvatarDataset
    from sigman_release_tpu.training.vae_trainer import VAETrainer

    trainer, state = setup
    vae_trainer = VAETrainer(CFG, interpret=True,
                             mesh=make_mesh((1,), ("data",)))
    vae_params = trainer.vae_params
    trainer.latent_renderer = (
        lambda z, batch: vae_trainer.render_latent(vae_params, z, batch)
    )
    ds = SyntheticAvatarDataset(CFG, n_items=1)
    batch = next(iter(DataLoader(ds, batch_size=1, shuffle=False,
                                 num_workers=1)))
    vis = str(tmp_path / "dit_sample.png")
    logs = trainer.sample_eval(state, batch, jax.random.PRNGKey(0),
                               vis_path=vis)
    assert np.isfinite(logs["sample_psnr"])
    import os as _os

    assert _os.path.exists(vis)


def test_dit_fsdp_shards_state_and_matches_local():
    """spmd='fsdp': params + optimizer state shard over the data axis
    (ZeRO/FSDP via GSPMD — the 1.7B dit preset cannot hold adam moments on
    one chip) and the global-semantics step matches the unsharded one."""
    from jax.sharding import PartitionSpec as P

    mesh8 = make_mesh((8,), ("data",))
    tr8 = DiTTrainer(CFG, mesh=mesh8, spmd="fsdp")
    tr1 = DiTTrainer(CFG, mesh=make_mesh((1,), ("data",)), spmd="local")
    vae = VAEModel(CFG)
    key = jax.random.PRNGKey(0)
    H, V = CFG.input_size, CFG.num_input_views
    vae_params = vae.init({"params": key, "sample": key},
                          jnp.zeros((1, V, 9, H, H)),
                          jnp.zeros((1, 3, H, H)), key)
    enc = ViTFeatureEncoder(embed_dim=CFG.text_embed_dim, depth=1, heads=2,
                            patch_size=16)
    enc_params = enc.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 64, 64)))
    for tr in (tr8, tr1):
        tr.vae_params, tr.encoder_params, tr.encoder = (vae_params,
                                                        enc_params, enc)

    s8 = tr8.init_state(jax.random.PRNGKey(2))
    s1 = tr1.init_state(jax.random.PRNGKey(2))
    # at least one param leaf actually sharded over 'data'
    sharded = [
        x for x in jax.tree.leaves(s8.params)
        if hasattr(x, "sharding") and "data" in str(x.sharding.spec)
    ]
    assert sharded, "no parameter leaf picked up a data-axis shard"

    rng = np.random.default_rng(0)
    B = 8
    batch = {
        "input": rng.normal(0, 1, (B, V, 9, H, H)).astype(np.float32),
        "UV_inital": rng.uniform(0, 1, (B, 3, H, H)).astype(np.float32),
        "sapiens_input": rng.normal(0, 1, (B, 3, H, H)).astype(np.float32),
    }
    n8, logs8 = tr8.train_step(
        jax.tree.map(jnp.array, s8), shard_batch(batch, mesh8),
        jax.random.PRNGKey(3))
    n1, logs1 = tr1.train_step(jax.tree.map(jnp.array, s1), batch,
                               jax.random.PRNGKey(3))
    # same global program, same rng -> identical loss
    np.testing.assert_allclose(float(logs8["loss"]), float(logs1["loss"]),
                               rtol=1e-4)
    # donated update keeps the sharding
    post = [x for x in jax.tree.leaves(n8.params)
            if hasattr(x, "sharding") and "data" in str(x.sharding.spec)]
    assert post


def test_dit_fsdp_tensor_parallel_mesh():
    """2-D (data, model) mesh: Megatron-style TP on qkv/FFN kernels +
    ZeRO over data, still numerically identical to the local program."""
    mesh = make_mesh((2, 4), ("data", "model"))
    tr = DiTTrainer(CFG, mesh=mesh, spmd="fsdp")
    tr1 = DiTTrainer(CFG, mesh=make_mesh((1,), ("data",)), spmd="local")
    vae = VAEModel(CFG)
    key = jax.random.PRNGKey(0)
    H, V = CFG.input_size, CFG.num_input_views
    vae_params = vae.init({"params": key, "sample": key},
                          jnp.zeros((1, V, 9, H, H)),
                          jnp.zeros((1, 3, H, H)), key)
    enc = ViTFeatureEncoder(embed_dim=CFG.text_embed_dim, depth=1, heads=2,
                            patch_size=16)
    enc_params = enc.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 64, 64)))
    for t in (tr, tr1):
        t.vae_params, t.encoder_params, t.encoder = (vae_params, enc_params,
                                                     enc)
    s = tr.init_state(jax.random.PRNGKey(2))
    s1 = tr1.init_state(jax.random.PRNGKey(2))
    qk = s.params["params"]["block_0"]["attn1"]["to_q"]["kernel"]
    assert "model" in str(qk.sharding.spec), qk.sharding
    ffn = s.params["params"]["block_0"]["ff"]["Dense_1"]["kernel"]
    assert "model" in str(ffn.sharding.spec), ffn.sharding

    rng = np.random.default_rng(0)
    B = 2
    batch = {
        "input": rng.normal(0, 1, (B, V, 9, H, H)).astype(np.float32),
        "UV_inital": rng.uniform(0, 1, (B, 3, H, H)).astype(np.float32),
        "sapiens_input": rng.normal(0, 1, (B, 3, H, H)).astype(np.float32),
    }
    _, logs = tr.train_step(jax.tree.map(jnp.array, s),
                            shard_batch(batch, mesh), jax.random.PRNGKey(3))
    _, logs1 = tr1.train_step(jax.tree.map(jnp.array, s1), batch,
                              jax.random.PRNGKey(3))
    # TP splits contraction dims -> partial-sum reassociation, amplified
    # through softmax on an untrained net; the pure-DP fsdp test pins the
    # exact-match case
    np.testing.assert_allclose(float(logs["loss"]), float(logs1["loss"]),
                               rtol=2e-2)
