"""Losses, metrics, schedulers, PLY IO."""

import jax
import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.config import PRESETS
from sigman_release_tpu.diffusion.ddim import DDIMScheduler
from sigman_release_tpu.diffusion.flow_matching import FlowScheduler
from sigman_release_tpu.losses.gan import (
    PatchDiscriminator,
    hinge_d_loss,
    hinge_g_loss,
)
from sigman_release_tpu.losses.lpips import LPIPS
from sigman_release_tpu.losses.metrics import masked_psnr, psnr, ssim
from sigman_release_tpu.utils.ply import load_ply, save_ply

CFG = PRESETS["test_tiny"]


def test_psnr_ssim_identity():
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (3, 32, 32)),
                      jnp.float32)
    assert float(psnr(img, img)) > 80
    assert abs(float(ssim(img, img)) - 1.0) < 1e-5
    noisy = jnp.clip(img + 0.1, 0, 1)
    assert float(psnr(img, noisy)) < 25
    assert float(ssim(img, noisy)) < 1.0


def test_masked_psnr_ignores_outside():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (1, 3, 16, 16)), jnp.float32)
    mask = jnp.zeros((1, 1, 16, 16)).at[:, :, 4:12, 4:12].set(1.0)
    noisy = img + 10.0 * (1 - mask)  # corrupt only outside mask
    assert float(masked_psnr(noisy, img, mask)) > 60


def test_ddim_add_noise_and_velocity_roundtrip():
    s = DDIMScheduler()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 4, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([100, 700], jnp.int32)
    xt = s.add_noise(x0, noise, t)
    v = s.get_velocity(x0, noise, t)
    # identity: sqrt(a)*xt - sqrt(1-a)*v == x0 (v-pred inversion)
    a = s.alphas_cumprod[t].reshape(-1, 1, 1, 1)
    x0_rec = jnp.sqrt(a) * xt - jnp.sqrt(1 - a) * v
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)


def test_ddim_zero_snr_terminal():
    s = DDIMScheduler(rescale_betas_zero_snr=True)
    assert float(s.alphas_cumprod[-1]) < 1e-10  # zero terminal SNR
    s2 = DDIMScheduler(rescale_betas_zero_snr=False)
    assert float(s2.alphas_cumprod[-1]) > 1e-10


def test_ddim_trailing_timesteps():
    s = DDIMScheduler()
    ts = np.asarray(s.timesteps(30))
    assert ts[0] == 999 and len(ts) == 30
    assert (np.diff(ts) < 0).all()


def test_ddim_perfect_model_denoises():
    """If the model predicts the true v, sampling recovers x0."""
    s = DDIMScheduler()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 4, 4, 4)) * 0.5
    ts = s.timesteps(10)
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])
    lat = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    for i in range(10):
        t = ts[i]
        a = s.alphas_cumprod[t]
        # true v for current sample given target x0
        eps = (lat - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
        v = jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * x0
        v = jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * x0
        lat = s.step(v, t, ts_prev[i], lat)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(x0), atol=1e-3)


def test_flow_scheduler_euler_path():
    s = FlowScheduler()
    x0 = jnp.ones((1, 2, 2, 2))
    noise = jnp.zeros_like(x0)
    v = s.velocity_target(x0, noise)  # = -x0
    # start at noise (t=1), integrate to t=0 -> x0
    lat = noise
    ts = np.linspace(1.0, 0.0, 11)
    for i in range(10):
        lat = s.step(v, ts[i], ts[i + 1], lat)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(x0), atol=1e-5)


def test_hinge_losses():
    real = jnp.ones((4, 4, 4, 1)) * 2.0
    fake = -jnp.ones((4, 4, 4, 1)) * 2.0
    assert float(hinge_d_loss(real, fake)) == 0.0  # perfectly separated
    assert float(hinge_g_loss(fake)) == 2.0


def test_discriminator_shapes():
    disc = PatchDiscriminator(ndf=16, n_layers=3)
    x = jnp.zeros((1, 2, 3, 64, 64))
    params = disc.init(jax.random.PRNGKey(0), x)
    out = disc.apply(params, x)
    assert out.shape[0] == 2 and out.shape[-1] == 1


def test_lpips_zero_for_identical():
    lp = LPIPS()
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 3, 64, 64)),
                    jnp.float32)
    params = lp.init(jax.random.PRNGKey(0), x, x)
    d_same = lp.apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    y = jnp.clip(x + 0.5, -1, 1)
    d_diff = lp.apply(params, x, y)
    assert float(d_diff[0]) > 1e-6


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 64
    g = np.concatenate(
        [rng.normal(0, 1, (n, 3)),                   # xyz
         rng.uniform(0.1, 1, (n, 1)),                # opacity
         rng.uniform(0.01, 0.1, (n, 3)),             # scale
         rng.normal(0, 1, (n, 4)),                   # quat
         rng.uniform(0, 1, (n, 3))],                 # rgb
        axis=1,
    ).astype(np.float32)
    path = str(tmp_path / "g.ply")
    written = save_ply(g, path, compatible=True)
    assert written == n
    g2 = load_ply(path, compatible=True)
    np.testing.assert_allclose(g2[:, 0:3], g[:, 0:3], atol=1e-5)
    np.testing.assert_allclose(g2[:, 3:4], g[:, 3:4], atol=1e-4)
    np.testing.assert_allclose(g2[:, 4:7], g[:, 4:7], rtol=1e-4)
    np.testing.assert_allclose(g2[:, 11:14], g[:, 11:14], atol=1e-5)


def test_lpips_converter_torch_oracle(tmp_path):
    """End-to-end LPIPS weight conversion: a torchvision-layout VGG16 .pth
    + richzhang-layout lin .pth convert through load_lpips_params and the
    flax LPIPS reproduces a plain-torch replica's distances
    (reference: core/loss/lpips.py:194-243)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF

    from sigman_release_tpu.losses.lpips import SCALE, SHIFT, load_lpips_params

    torch.manual_seed(0)
    # torchvision vgg16.features layout: conv indices 0,2 | 5,7 | 10,12,14 |
    # 17,19,21 | 24,26,28 with ReLU between and MaxPool at block ends
    cfg = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]
    layers, slice_ends = [], []
    cin = 3
    for bi, (n, ch) in enumerate(cfg):
        for _ in range(n):
            layers += [tnn.Conv2d(cin, ch, 3, padding=1), tnn.ReLU()]
            cin = ch
        slice_ends.append(len(layers))
        if bi < len(cfg) - 1:
            layers.append(tnn.MaxPool2d(2, 2))
    features = tnn.Sequential(*layers).eval()
    # scale weights down: random VGG activations explode through 13 convs
    with torch.no_grad():
        for m in features:
            if isinstance(m, tnn.Conv2d):
                m.weight *= 0.1
    vgg_sd = {f"features.{i}.{p}": t for i, m in enumerate(features)
              for p, t in getattr(m, "state_dict", dict)().items()}
    vgg_path = str(tmp_path / "vgg16.pth")
    torch.save(vgg_sd, vgg_path)

    lins = [torch.rand(1, ch, 1, 1) * 0.1 for _, ch in cfg]
    lin_sd = {f"lin{i}.model.1.weight": w for i, w in enumerate(lins)}
    lin_path = str(tmp_path / "lins.pth")
    torch.save(lin_sd, lin_path)

    params = load_lpips_params(vgg_path, lin_path)
    assert params is not None

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)

    # torch replica of the LPIPS computation
    def t_feats(t):
        t = (t - torch.as_tensor(SHIFT).view(1, 3, 1, 1)) / \
            torch.as_tensor(SCALE).view(1, 3, 1, 1)
        outs, h, prev = [], t, 0
        for end in slice_ends:
            for m in layers[prev:end]:
                h = m(h)
            outs.append(h)
            prev = end
        return outs

    with torch.no_grad():
        fx = t_feats(torch.as_tensor(x))
        fy = t_feats(torch.as_tensor(y))
        total = torch.zeros(2)
        for fa, fb, w in zip(fx, fy, lins):
            fa = fa / (fa.square().sum(1, keepdim=True) + 1e-10).sqrt()
            fb = fb / (fb.square().sum(1, keepdim=True) + 1e-10).sqrt()
            d = (fa - fb).square()
            total += (d * w).sum(1).mean((1, 2))

    model = LPIPS()
    out = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(out, total.numpy(), rtol=2e-4, atol=1e-6)


def test_lpips_alex_converter_torch_oracle(tmp_path):
    """Same oracle for the alex eval backbone (reference eval uses
    LPIPS(net='alex'), core/loss/eval.py:72): a torchvision-alexnet-layout
    .pth + lin weights convert and reproduce a plain-torch replica."""
    import torch
    import torch.nn as tnn

    from sigman_release_tpu.losses.lpips import (
        ALEX_CHANNELS, SCALE, SHIFT, load_lpips_params,
    )

    torch.manual_seed(0)
    # torchvision alexnet.features: conv idx 0,3,6,8,10; relu after each;
    # maxpool3/s2 at idx 2 and 5 (and 12, after the last slice tap)
    layers = [
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(),      # 0,1
        tnn.MaxPool2d(3, 2),                                         # 2
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(),               # 3,4
        tnn.MaxPool2d(3, 2),                                         # 5
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),              # 6,7
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),              # 8,9
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),              # 10,11
    ]
    features = tnn.Sequential(*layers).eval()
    with torch.no_grad():
        for m in features:
            if isinstance(m, tnn.Conv2d):
                m.weight *= 0.1
    sd = {f"features.{i}.{p}": t for i, m in enumerate(features)
          for p, t in getattr(m, "state_dict", dict)().items()}
    alex_path = str(tmp_path / "alexnet.pth")
    torch.save(sd, alex_path)

    lins = [torch.rand(1, ch, 1, 1) * 0.1 for ch in ALEX_CHANNELS]
    lin_sd = {f"lin{i}.model.1.weight": w for i, w in enumerate(lins)}
    lin_path = str(tmp_path / "lins_alex.pth")
    torch.save(lin_sd, lin_path)

    params = load_lpips_params(alex_path, lin_path, net="alex")
    assert params is not None

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)

    slice_ends = [2, 5, 8, 10, 12]  # positions AFTER each slice's relu

    def t_feats(t):
        t = (t - torch.as_tensor(SHIFT).view(1, 3, 1, 1)) / \
            torch.as_tensor(SCALE).view(1, 3, 1, 1)
        outs, h, prev = [], t, 0
        for end in slice_ends:
            for m in layers[prev:end]:
                h = m(h)
            outs.append(h)
            prev = end
        return outs

    with torch.no_grad():
        fx = t_feats(torch.as_tensor(x))
        fy = t_feats(torch.as_tensor(y))
        total = torch.zeros(2)
        for fa, fb, w in zip(fx, fy, lins):
            fa = fa / (fa.square().sum(1, keepdim=True) + 1e-10).sqrt()
            fb = fb / (fb.square().sum(1, keepdim=True) + 1e-10).sqrt()
            d = (fa - fb).square()
            total += (d * w).sum(1).mean((1, 2))

    model = LPIPS(net="alex")
    out = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(out, total.numpy(), rtol=2e-4, atol=1e-6)


def test_eval_lpips_net_alex_wiring():
    """eval_lpips_net='alex' gives dual lpips params and a finite alex eval
    metric while the LOSS still runs the vgg net."""
    from sigman_release_tpu.config import PRESETS
    from sigman_release_tpu.parallel.mesh import make_mesh, shard_batch
    from sigman_release_tpu.training.vae_trainer import VAETrainer
    from sigman_release_tpu.data import DataLoader, SyntheticAvatarDataset

    cfg = PRESETS["test_tiny"].replace(num_views=2, num_input_views=2,
                                       eval_lpips_net="alex")
    trainer = VAETrainer(cfg, interpret=True,
                         mesh=make_mesh((1,), ("data",)))
    key = jax.random.PRNGKey(0)
    state, lpips_params = trainer.init_state(key)
    assert set(lpips_params) == {"loss", "eval"}
    assert "alex" in lpips_params["eval"]["params"]
    assert "vgg" in lpips_params["loss"]["params"]

    ds = SyntheticAvatarDataset(cfg, n_items=1)
    batch = next(iter(DataLoader(ds, batch_size=1, shuffle=False,
                                 num_workers=1)))
    sharded = shard_batch(batch, trainer.mesh)
    metrics, _ = trainer.eval_step(state, sharded, lpips_params, key)
    assert np.isfinite(float(metrics["lpips"]))
    state2, logs = trainer.train_step_g(state, sharded, lpips_params, key)
    assert np.isfinite(float(logs["loss"]))
