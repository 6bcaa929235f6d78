"""PatchGAN discriminator + hinge losses (flax).

Equivalent of the reference's NLayerDiscriminator2D
(/root/reference/core/loss/discriminator.py:74-127): 3x3 convs (the
reference's kw=3, NOT the pix2pix 4x4), stride 2, BatchNorm (here
GroupNorm — batch-statistics-free, SPMD-friendly and equivalent in effect
for a patch discriminator; reference BN affine params map onto GN scale/bias
in the checkpoint converter, running stats have no GN counterpart),
LeakyReLU(0.2); multi-view inputs fold the view axis into batch.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


def _groups(c: int) -> int:
    return math.gcd(32, c)


class PatchDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 4

    @nn.compact
    def __call__(self, images):
        """images [B,V,3,H,W] or [B,3,H,W] -> patch logits [N,h,w,1]."""
        x = images
        if x.ndim == 5:
            b, v = x.shape[:2]
            x = x.reshape(b * v, *x.shape[2:])
        x = jnp.moveaxis(x, 1, -1)                    # NHWC
        x = nn.Conv(self.ndf, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))(x)
        x = nn.leaky_relu(x, 0.2)
        mult = 1
        for i in range(1, self.n_layers):
            mult = min(2 ** i, 8)
            x = nn.Conv(self.ndf * mult, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=False)(x)
            x = nn.GroupNorm(num_groups=_groups(self.ndf * mult))(x)
            x = nn.leaky_relu(x, 0.2)
        mult = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * mult, (3, 3), strides=(1, 1),
                    padding=((1, 1), (1, 1)), use_bias=False)(x)
        x = nn.GroupNorm(num_groups=_groups(self.ndf * mult))(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)))(x)


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray):
    """0.5 * (mean relu(1 - real) + mean relu(1 + fake))."""
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - logits_real))
        + jnp.mean(nn.relu(1.0 + logits_fake))
    )


def hinge_g_loss(logits_fake: jnp.ndarray):
    return -jnp.mean(logits_fake)
