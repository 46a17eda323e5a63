"""Depth-regression U-Net (NHWC).

Mirrors the reference Unet (models/networks/architectures.py:174-279):
8 stride-2 4x4 down convs / 8 up stages (bilinear 2x + 3x3 conv) with
skip concatenation, BatchNorm between stages, LeakyReLU(0.2) on the way
down, ReLU on the way up, raw (un-squashed) output.  norm_G "spectral"
variants wrap every conv in spectral norm.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from pixelsynth_tpu.models.layers import SNConv, SyncBatchNorm, upsample2x


class UNet(nn.Module):
    num_filters: int = 32
    channels_out: int = 1
    spectral: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True) -> jnp.ndarray:
        nf = self.num_filters

        def down(h, feats, norm=True):
            h = SNConv(feats, 4, 2, 1, spectral=self.spectral)(h, train=train)
            if norm:
                h = SyncBatchNorm()(h, train=train)
            return h

        def up(h, feats, norm=True):
            h = SNConv(feats, 3, 1, 1, spectral=self.spectral)(
                upsample2x(nn.relu(h)), train=train
            )
            if norm:
                h = SyncBatchNorm()(h, train=train)
            return h

        lrelu = lambda h: nn.leaky_relu(h, 0.2)

        e1 = SNConv(nf, 4, 2, 1, spectral=self.spectral)(x, train=train)
        e2 = down(lrelu(e1), nf * 2)
        e3 = down(lrelu(e2), nf * 4)
        e4 = down(lrelu(e3), nf * 8)
        e5 = down(lrelu(e4), nf * 8)
        e6 = down(lrelu(e5), nf * 8)
        e7 = down(lrelu(e6), nf * 8)
        e8 = down(lrelu(e7), nf * 8, norm=False)

        d1 = jnp.concatenate([up(e8, nf * 8), e7], -1)
        d2 = jnp.concatenate([up(d1, nf * 8), e6], -1)
        d3 = jnp.concatenate([up(d2, nf * 8), e5], -1)
        d4 = jnp.concatenate([up(d3, nf * 8), e4], -1)
        d5 = jnp.concatenate([up(d4, nf * 4), e3], -1)
        d6 = jnp.concatenate([up(d5, nf * 2), e2], -1)
        d7 = jnp.concatenate([up(d6, nf), e1], -1)
        d8 = SNConv(self.channels_out, 3, 1, 1, spectral=self.spectral)(
            upsample2x(nn.relu(d7)), train=train
        )
        return d8
