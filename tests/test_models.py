"""VAE + DiT model forward/shape tests (test_tiny preset)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigman_release_tpu.config import PRESETS
from sigman_release_tpu.models.dit import DiTModel, rope_2d, apply_rope
from sigman_release_tpu.models.render_head import RenderHead
from sigman_release_tpu.models.vae import (
    VAEModel,
    compose_rotations,
    sample_gaussian_attrs,
)

CFG = PRESETS["test_tiny"]


@pytest.fixture(scope="module")
def vae_setup():
    model = VAEModel(CFG)
    key = jax.random.PRNGKey(0)
    B, V, H = 1, CFG.num_input_views, CFG.input_size
    images = jnp.zeros((B, V, 9, H, H))
    uv = jnp.zeros((B, 3, H, H))
    params = model.init({"params": key, "sample": key}, images, uv, key)
    return model, params


def test_vae_forward_shapes(vae_setup):
    model, params = vae_setup
    key = jax.random.PRNGKey(1)
    B, V, H = 1, CFG.num_input_views, CFG.input_size
    images = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (B, V, 9, H, H)), jnp.float32
    )
    uv = jnp.zeros((B, 3, H, H))
    attr_map, posterior = model.apply(params, images, uv, key)
    assert attr_map.shape == (B, H, H, 13)
    assert posterior.mean.shape == (
        B, CFG.uv_query_size, CFG.uv_query_size, CFG.latent_channels
    )
    kl = posterior.kl()
    assert kl.shape == (B,) and np.isfinite(np.asarray(kl)).all()
    # opacity/rgb channels sigmoid-activated -> in (0,1)
    a = np.asarray(attr_map)
    assert a[..., 0].min() >= 0 and a[..., 0].max() <= 1


def test_vae_encode_decode_roundtrip_shapes(vae_setup):
    model, params = vae_setup
    B, V, H = 1, CFG.num_input_views, CFG.input_size
    images = jnp.zeros((B, V, 9, H, H))
    uv = jnp.zeros((B, 3, H, H))
    posterior = model.apply(params, images, uv, method=VAEModel.encode)
    z = posterior.mode()
    attr = model.apply(params, z, method=VAEModel.decode)
    assert attr.shape == (B, H, H, 13)


def test_sample_gaussian_attrs_activations():
    attr_map = jnp.zeros((1, 16, 16, 13)).at[..., :].set(0.5)
    uv = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (32, 2)),
                     jnp.float32)
    out = sample_gaussian_attrs(attr_map, uv)
    # 0.5 everywhere -> scale (0.5-0.5)*2 = 0, rot 0
    np.testing.assert_allclose(np.asarray(out["scale"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["rot"]), 0.0, atol=1e-6)
    assert out["opacity"].shape == (1, 32, 1)


def test_compose_rotations_orthonormal():
    rng = np.random.default_rng(2)
    B, N = 2, 8
    rot_delta = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
    from sigman_release_tpu.ops.rotations import quaternion_to_matrix
    init_rot = quaternion_to_matrix(
        jnp.asarray(rng.normal(size=(N, 4)), jnp.float32))
    tfs = jnp.broadcast_to(jnp.eye(4), (B, N, 4, 4))
    R = compose_rotations(rot_delta, init_rot, tfs)
    eye = np.broadcast_to(np.eye(3), (B, N, 3, 3))
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bnij,bnkj->bnik", R, R)), eye, atol=1e-5
    )


def test_dit_forward_shapes():
    model = DiTModel(CFG)
    key = jax.random.PRNGKey(0)
    B = 2
    latent = jnp.zeros((B, CFG.in_channels, CFG.sample_height, CFG.sample_width))
    cond = jnp.zeros((B, CFG.text_embed_dim, 16, 16))  # 4x4 conv -> 16 tokens
    t = jnp.array([0, 500], jnp.int32)
    params = model.init(key, latent, cond, t)
    out = model.apply(params, latent, cond, t)
    assert out.shape == (B, CFG.out_channels, CFG.sample_height, CFG.sample_width)
    assert np.isfinite(np.asarray(out)).all()


def test_dit_timestep_changes_output():
    model = DiTModel(CFG)
    key = jax.random.PRNGKey(0)
    latent = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (1, CFG.in_channels,
                                               CFG.sample_height,
                                               CFG.sample_width)), jnp.float32)
    cond = jnp.zeros((1, CFG.text_embed_dim, 16, 16))
    params = model.init(key, latent, cond, jnp.array([0], jnp.int32))
    o1 = model.apply(params, latent, cond, jnp.array([0], jnp.int32))
    o2 = model.apply(params, latent, cond, jnp.array([900], jnp.int32))
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-4


def test_rope_rotation_preserves_norm():
    cos, sin = rope_2d(16, 4, 4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 2, 16)),
                    jnp.float32)
    y = apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1), rtol=1e-5,
    )
    # token 0 gets zero rotation -> unchanged
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(x[:, 0]),
                               atol=1e-6)


def test_render_head_decode():
    x = jnp.asarray(np.random.default_rng(0).normal(0, 2, (2, 14, 8, 8)),
                    jnp.float32)
    g = RenderHead.decode(x)
    assert g["position"].shape == (2, 64, 3)
    p = np.asarray(g["position"])
    assert p.min() >= -1 and p.max() <= 1
    q = np.asarray(g["rotation"])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    cov = RenderHead.covariances(g)
    assert cov.shape == (2, 64, 6)
    # diagonal entries positive
    assert np.asarray(cov)[..., [0, 3, 5]].min() > 0


def test_apply_rope_matches_diffusers_semantics():
    """apply_rope == diffusers apply_rotary_emb (use_real=True,
    repeat_interleave cos/sin, interleaved-pair rotation) — torch replica."""
    import torch

    from sigman_release_tpu.models.dit import apply_rope, rope_2d

    hd, gh, gw = 8, 2, 3
    cos, sin = rope_2d(hd, gh, gw)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, gh * gw, 2, hd)).astype(np.float32)

    tc = torch.as_tensor(np.asarray(cos))
    ts = torch.as_tensor(np.asarray(sin))
    tx = torch.as_tensor(x).permute(0, 2, 1, 3)        # [B,h,S,d]
    xr, xi = tx.reshape(*tx.shape[:-1], -1, 2).unbind(-1)
    rot = torch.stack([-xi, xr], dim=-1).flatten(3)
    t_out = (tx * tc + rot * ts).permute(0, 2, 1, 3).numpy()

    j_out = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(j_out, t_out, atol=1e-6)


def test_timestep_sinusoid_matches_diffusers():
    """diffusers Timesteps(flip_sin_to_cos=True, downscale_freq_shift=0)."""
    from sigman_release_tpu.models.dit import timestep_sinusoid

    dim = 16
    t = np.array([0, 1, 500, 999], np.int32)
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half) / half
    emb = t[:, None].astype(np.float64) * np.exp(exponent)[None]
    ref = np.concatenate([np.cos(emb), np.sin(emb)], axis=-1)
    out = np.asarray(timestep_sinusoid(jnp.asarray(t), dim))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_vae_attn_dropout_train_only(vae_setup):
    """Bottleneck attention dropout (reference autoencoder.py:119, 0.1):
    train=True + distinct 'dropout' rngs perturb the posterior; the default
    (eval) path is deterministic and identical to pre-dropout behavior."""
    model, params = vae_setup
    key = jax.random.PRNGKey(1)
    B, V, H = 1, CFG.num_input_views, CFG.input_size
    images = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (B, V, 9, H, H)), jnp.float32
    )
    uv = jnp.zeros((B, 3, H, H))

    def post(train, drop_seed):
        rngs = {"dropout": jax.random.PRNGKey(drop_seed)} if train else None
        _, p = model.apply(params, images, uv, key, True, train, rngs=rngs)
        return np.asarray(p.mean)

    e1, e2 = post(False, 0), post(False, 1)
    np.testing.assert_array_equal(e1, e2)          # eval: deterministic
    t1, t2 = post(True, 0), post(True, 1)
    assert np.abs(t1 - t2).max() > 0               # train: rng-dependent
    assert np.abs(t1 - e1).max() > 0


def test_remat_policy_pure_scheduling(vae_setup):
    """Config.remat_policy ("block" | "conv" | "none") is a pure scheduling
    transform: same params, same inputs -> identical outputs and identical
    gradients (the "conv" policy saves tagged conv outputs and recomputes
    only GN/SiLU in backward — see models.vae._resnet_for)."""
    _, params = vae_setup
    key = jax.random.PRNGKey(0)
    B, V, H = 1, CFG.num_input_views, CFG.input_size
    images = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (B, V, 9, H, H)), jnp.float32
    )
    uv = jnp.zeros((B, 3, H, H))

    def run(policy):
        model = VAEModel(CFG.replace(remat_policy=policy))

        def loss(p):
            attr, _ = model.apply(p, images, uv, key, True, False)
            return jnp.sum(attr ** 2)

        val, grads = jax.value_and_grad(loss)(params)
        return np.asarray(val), grads

    v_block, g_block = run("block")
    for policy in ("conv", "conv_enc", "none"):
        v, g = run(policy)
        np.testing.assert_array_equal(v, v_block)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5,
                err_msg=f"{policy} grad mismatch"),
            g, g_block)
