#!/usr/bin/env python
"""Quantify the gradient bias of renderer pair-capacity drops.

The binning drops (gaussian, tile) pairs when they exceed the emission
windows / pair budget — counted in ``overflow``, never silent. The CUDA
reference never drops (gs.py's rasterizer is exact), so the honest question
for the committed defaults is: *how biased are the gradients at a
high-overflow operating point?*

Method: same params / batch / rng, G-loss gradients under (a) the default
capacity and (b) a widened capacity that drops ~4x fewer pairs; report
overflow counts, per-parameter-group and overall cosine similarity, and
relative L2 error. Run at the synthetic 26k-vert avatar (the worst case
committed in BENCH_r03_train — its KNN init scales are atypically large) and
at --verts 50000 (~100k gaussians, real subdivided-SMPL-X scale).

    python benchmarks/capacity_bias.py --verts 26000
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verts", type=int, default=26000)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--wide_factor", type=int, default=16)
    ap.add_argument("--wide_big_win", type=int, default=14)
    # pin the BASE config explicitly (since round 5 the vae_b preset itself
    # carries the widened 12/12 capacity; pass 5/6 here to reproduce the
    # pre-round-5 default as the comparison base)
    ap.add_argument("--base_factor", type=int, default=None)
    ap.add_argument("--base_big_win", type=int, default=None)
    # one config per PROCESS: both grad graphs + both grad trees at 512^2
    # scale OOM a 16 GB chip in one process. Run --config default and
    # --config widened (each saves an npz), then --compare.
    ap.add_argument("--config", choices=["default", "widened"],
                    default=None)
    ap.add_argument("--save_dir", default="/tmp/capacity_bias")
    ap.add_argument("--compare", action="store_true")
    args = ap.parse_args()

    if args.compare:
        return compare(args)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from sigman_release_tpu.body.smplx import synthetic_body_model
    from sigman_release_tpu.body.template import synthetic_template
    from sigman_release_tpu.config import PRESETS
    from sigman_release_tpu.geometry.cameras import (
        camera_bundle, orbit_camera, projection_matrix,
    )
    from sigman_release_tpu.parallel.mesh import make_mesh
    from sigman_release_tpu.training.vae_trainer import VAETrainer

    base = PRESETS["vae_b"].replace(
        input_size=args.size, output_size=args.size,
        batch_size=args.batch, lambda_lpips=1.0, disc_start=0,
    )
    if args.base_factor is not None:
        base = base.replace(pair_budget_factor=args.base_factor)
    if args.base_big_win is not None:
        base = base.replace(render_big_win=args.base_big_win)
    wide = base.replace(pair_budget_factor=args.wide_factor,
                        render_big_win=args.wide_big_win)

    body = synthetic_body_model(n_verts=args.verts)
    template = synthetic_template(body)
    mesh = make_mesh((1,), ("data",))
    tr_a = VAETrainer(base, body_model=body, template=template, mesh=mesh)
    tr_b = VAETrainer(wide, body_model=body, template=template, mesh=mesh)

    key = jax.random.PRNGKey(0)
    state, lpips_params = tr_a.init_state(key)
    # the grad graph peaks ~13 GB (compile-time estimate); the full
    # TrainState's Adam moments (~2x params, unused here) sitting in HBM
    # tip it into runtime OOM on a 16 GB chip — keep only what the loss
    # closure reads and free the rest before dispatch
    params, logvar = state.params, state.logvar
    disc_params, step = state.disc_params, state.step
    for leaf in jax.tree.leaves((state.opt_state_g, state.opt_state_d)):
        if hasattr(leaf, "delete"):
            leaf.delete()
    del state

    B, V, H = args.batch, base.num_input_views, base.input_size
    rng = np.random.default_rng(0)
    proj = projection_matrix(base.znear, base.zfar, base.fovx, base.fovy)
    c2ws = np.stack([
        orbit_camera(10.0, 360.0 * v / base.num_views, base.cam_radius)
        for v in range(base.num_views)
    ])
    cv, cvp, _ = camera_bundle(c2ws, proj)
    batch = {
        "input": jnp.asarray(rng.normal(0, 1, (B, V, 9, H, H)),
                             jnp.float32),
        "UV_inital": jnp.asarray(rng.uniform(0, 1, (B, 3, H, H)),
                                 jnp.float32),
        "smpl_params": jnp.asarray(rng.normal(0, 0.1, (B, 175)),
                                   jnp.float32),
        "cam_view": jnp.tile(jnp.asarray(cv)[None], (B, 1, 1, 1)),
        "cam_view_proj": jnp.tile(jnp.asarray(cvp)[None], (B, 1, 1, 1)),
        "images_output": jnp.asarray(rng.uniform(
            0, 1, (B, base.num_views, 3, args.size, args.size)), jnp.float32),
        "masks_output": jnp.ones(
            (B, base.num_views, 1, args.size, args.size), jnp.float32),
    }

    def grads_for(trainer):
        # batch/state/deformer-state ride as ARGUMENTS: closed-over arrays
        # embed as HLO constants and blow the remote-compile request past
        # its length limit (HTTP 413) at 512^2 x 6-view batch scale — and
        # at 100k-gaussian template scale the deformer's podir alone is
        # ~600 MB (hence the explicit deformer_state threading)
        def loss_fn(diff, b, step, lp, dp, ds):
            params, logvar = diff
            outputs, posterior = trainer.forward(params, b, key, train=True,
                                                 deformer_state=ds)
            overflow = outputs.pop("overflow")
            loss, _ = trainer.loss.generator(
                outputs, posterior, step, logvar,
                lpips_params=lp, disc_params=dp,
            )
            return loss, jnp.sum(overflow)
        g, ov = jax.jit(jax.grad(loss_fn, has_aux=True))(
            (params, logvar), batch, step,
            lpips_params, disc_params, trainer.deformer_state)
        return jax.tree.map(np.asarray, g), float(ov)

    which = args.config or "default"
    trainer = tr_a if which == "default" else tr_b
    g, ov = grads_for(trainer)
    os.makedirs(args.save_dir, exist_ok=True)
    flatdict = {}
    from flax.traverse_util import flatten_dict
    for kp, v in flatten_dict(g[0]["params"]).items():
        flatdict["/".join(map(str, kp))] = np.asarray(v)
    flatdict["__logvar__"] = np.asarray(g[1])
    np.savez(os.path.join(args.save_dir, f"{which}.npz"),
             __overflow__=ov, **flatdict)
    print(json.dumps({"saved": which, "overflow": ov,
                      "capacity": (f"factor={trainer.cfg.pair_budget_factor} "
                                   f"big_win={trainer.cfg.render_big_win}")}))


def compare(args):
    import numpy as np

    a = np.load(os.path.join(args.save_dir, "default.npz"))
    b = np.load(os.path.join(args.save_dir, "widened.npz"))
    keys = [k for k in a.files if k != "__overflow__"]

    def flat(z, ks):
        return np.concatenate([np.ravel(z[k]).astype(np.float64) for k in ks])

    fa, fb = flat(a, keys), flat(b, keys)
    cos = float(fa @ fb / (np.linalg.norm(fa) * np.linalg.norm(fb) + 1e-30))
    rel = float(np.linalg.norm(fa - fb) / (np.linalg.norm(fb) + 1e-30))
    mods = sorted({k.split("/")[0] for k in keys})
    per_mod = {}
    for m in mods:
        ks = [k for k in keys if k.split("/")[0] == m]
        xa, xb = flat(a, ks), flat(b, ks)
        per_mod[m] = round(float(
            xa @ xb / (np.linalg.norm(xa) * np.linalg.norm(xb) + 1e-30)), 5)
    print(json.dumps({
        "verts": args.verts,
        "overflow_default": float(a["__overflow__"]),
        "overflow_widened": float(b["__overflow__"]),
        "grad_cosine_default_vs_widened": round(cos, 6),
        "grad_rel_l2": round(rel, 6),
        "per_module_cosine": per_mod,
        "capacity_widened": f"factor={args.wide_factor} "
                            f"big_win={args.wide_big_win}",
    }))


if __name__ == "__main__":
    main()
