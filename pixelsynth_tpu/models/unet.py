"""Depth-regression U-Net (NHWC).

Mirrors the reference Unet (models/networks/architectures.py:174-279):
stride-2 4x4 down convs to 1x1, then bilinear-2x + 3x3 conv up stages with
skip concatenation, BatchNorm between stages, LeakyReLU(0.2) down, ReLU up,
raw (un-squashed) output.  norm_G "spectral" variants wrap every conv in
spectral norm.

`levels` generalizes the reference's fixed 8-level 256x256 geometry to any
power-of-two input (levels = log2(W)); levels=8 reproduces the reference
exactly (channel ladder nf, 2nf, 4nf, 8nf, 8nf, ...).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pixelsynth_tpu.models.layers import (
    SNConv, StandingStatsBN, SyncBatchNorm, upsample2x,
)


class UNet(nn.Module):
    num_filters: int = 32
    channels_out: int = 1
    spectral: bool = True
    levels: int = 8
    norm: str = "batch"  # "batch" | "batchstanding" (norm_G suffix)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True) -> jnp.ndarray:
        nf = self.num_filters
        L = self.levels
        mults = [1, 2, 4] + [8] * (L - 3)
        chans = [nf * m for m in mults[:L]]

        def make_norm(h, *, train):
            if self.norm == "batchstanding":
                return StandingStatsBN(h.shape[-1])(h, train=train)
            return SyncBatchNorm()(h, train=train)

        def down(h, feats, norm=True):
            h = SNConv(feats, 4, 2, 1, spectral=self.spectral)(h, train=train)
            if norm:
                h = make_norm(h, train=train)
            return h

        def up(h, feats, norm=True):
            h = SNConv(feats, 3, 1, 1, spectral=self.spectral)(
                upsample2x(nn.relu(h)), train=train
            )
            if norm:
                h = make_norm(h, train=train)
            return h

        lrelu = lambda h: nn.leaky_relu(h, 0.2)

        encs = []
        h = SNConv(chans[0], 4, 2, 1, spectral=self.spectral)(x, train=train)
        encs.append(h)
        for i in range(1, L):
            h = down(lrelu(encs[-1]), chans[i], norm=(i != L - 1))
            encs.append(h)

        # decoder: mirror channel ladder; skip-concat all but the last stage
        h = encs[-1]
        for i in range(L - 1, 0, -1):
            h = up(h, chans[i - 1] if i <= 3 else chans[i])
            h = jnp.concatenate([h, encs[i - 1]], axis=-1)
        h = SNConv(self.channels_out, 3, 1, 1, spectral=self.spectral)(
            upsample2x(nn.relu(h)), train=train
        )
        return h
