"""pix2pixHD multiscale PatchGAN discriminator (NHWC).

Mirrors models/networks/discriminators.py:78-215: 2 scales, each a 4-layer
70x70 PatchGAN with spectral-norm convs + instance norm and LeakyReLU(0.2),
returning intermediate features of every layer for the feature-matching
loss; scale 2 sees a 2x average-pooled input.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

import jax
from pixelsynth_tpu.models.layers import SNConv


def _avg_pool_exclude_pad(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 pad-1 average pool with count_include_pad=False
    (the multiscale downsample, discriminators.py:168-175)."""
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    win = dict(window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
               padding=((0, 0), (1, 1), (1, 1), (0, 0)))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, **win)
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, **win)
    return s / n


class NLayerDiscriminator(nn.Module):
    """discriminators.py:78-140 (n_layers_D = 4).

    Only the middle layers go through the norm_layer wrapper
    (spectral norm + bias removal + instance norm,
    models/layers/normalization.py:60-88); the first and last convs are
    plain Conv2d with bias (discriminators.py:89-116)."""

    ndf: int = 64
    n_layers: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = True) -> List[jnp.ndarray]:
        results = []
        nf = self.ndf
        h = SNConv(nf, 4, 2, 2, spectral=False)(x, train=train)
        h = nn.leaky_relu(h, 0.2)
        results.append(h)
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            stride = 1 if n == self.n_layers - 1 else 2
            h = SNConv(nf, 4, stride, 2, spectral=True, use_bias=False)(h, train=train)
            # instance norm, affine=False, eps matching torch InstanceNorm2d
            h = nn.GroupNorm(
                num_groups=None, group_size=1, use_scale=False, use_bias=False,
                epsilon=1e-5,
            )(h)
            h = nn.leaky_relu(h, 0.2)
            results.append(h)
        h = SNConv(1, 4, 1, 2, spectral=False)(h, train=train)
        results.append(h)
        return results


class MultiscaleDiscriminator(nn.Module):
    """discriminators.py:143-215 (num_D = 2)."""

    ndf: int = 64
    num_D: int = 2
    n_layers: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = True) -> List[List[jnp.ndarray]]:
        outs = []
        h = x
        for i in range(self.num_D):
            outs.append(NLayerDiscriminator(self.ndf, self.n_layers)(h, train=train))
            if i != self.num_D - 1:
                h = _avg_pool_exclude_pad(h)
        return outs
