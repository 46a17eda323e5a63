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

from pixelsynth_tpu.models.layers import SNConv, avg_pool


class NLayerDiscriminator(nn.Module):
    """discriminators.py:78-140 (n_layers_D = 4)."""

    ndf: int = 64
    n_layers: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = True) -> List[jnp.ndarray]:
        results = []
        nf = self.ndf
        h = SNConv(nf, 4, 2, 2, spectral=True)(x, train=train)
        h = nn.leaky_relu(h, 0.2)
        results.append(h)
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            stride = 1 if n == self.n_layers - 1 else 2
            h = SNConv(nf, 4, stride, 2, spectral=True, use_bias=False)(h, train=train)
            # instance norm, affine=False (torch default)
            h = nn.GroupNorm(
                num_groups=None, group_size=1, use_scale=False, use_bias=False
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
                h = avg_pool(h, 3, 2, 1)
        return outs
