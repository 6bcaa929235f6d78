"""SIGMAN-TPU: a TPU-native framework for scaling 3D human Gaussian generation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``yyvhang/SIGMAN_release`` (ICCV 2025, arXiv:2504.06982):

* a differentiable 3D Gaussian-splatting renderer written as Pallas TPU
  kernels (replacing the reference's CUDA ``diff-gaussian-rasterization``),
* an SMPL-X body model + LBS deformer expressed as pure JAX transforms,
* a UV-space Gaussian VAE and a CogVideoX-style DiT (flax.linen),
* DDIM v-prediction sampling, training loops, and SPMD data-parallel
  scaling over ``jax.sharding.Mesh``.

Layout:
  ops/        Pallas + JAX kernels (rasterizer, knn, grid_sample, rotations)
  geometry/   cameras, projection, rays
  body/       SMPL-X, LBS, deformer, templates
  models/     VAE, DiT, render head
  diffusion/  schedulers + sampling pipeline
  losses/     photometric, LPIPS, GAN, metrics
  data/       dataset readers, augmentation, host sharding
  parallel/   mesh + sharding helpers
  training/   train steps, checkpointing, eval
  utils/      ply io, config, logging, profiling
"""

__version__ = "0.1.0"
