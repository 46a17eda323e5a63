"""BigGAN-style ResNet feature encoder and refinement decoder (NHWC).

Mirrors the reference's table-driven architectures
(models/networks/architectures.py:91-167 + configs.py:3-382).  The arch
tables below transcribe the channel/resample specs for the setups the
pipeline uses; the decoder consumes the splatted features (+1 foreground
channel when outpainting, utilities.py:30-34) and optionally predicts a
residual over the input (architectures.py:151-161).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from pixelsynth_tpu.models.layers import ResNetBlock


def get_resnet_arch(model_type: str, ngf: int = 64) -> Dict:
    """Channel tables (models/networks/configs.py:3-382; 256W8UpDown64 at
    configs.py:54-99)."""
    setup = model_type.split("_")[1]
    shallow_enc = [None, ngf // 2, ngf // 2, ngf // 2, ngf, ngf, ngf, ngf, 64]
    std_dec_tail = [ngf, ngf * 2, ngf * 4, ngf * 4, ngf * 2, ngf * 2, ngf * 2, 3]
    if setup in ("256W8UpDown", "256W8UpDown64", "256W8UpDownRGB",
                 "256W8UpDown3", "256W8UpDown3SuperRes"):
        dec_in = {"256W8UpDown": 128, "256W8UpDown64": 64, "256W8UpDownRGB": 3,
                  "256W8UpDown3": None, "256W8UpDown3SuperRes": None}[setup]
        return {
            "layers_enc": list(shallow_enc),
            "downsample": [False] * 8,
            # dec_in None means "input channels" (filled by the caller)
            "layers_dec": [dec_in] + std_dec_tail,
            "upsample": [False, "Down", "Down", False, "Up", "Up", False, False],
        }
    if setup == "256W8UpDown3_ultra":
        # deeper pyramid: 3 Downs / 3 Ups (configs.py:295-341)
        return {
            "layers_enc": list(shallow_enc),
            "downsample": [False] * 8,
            "layers_dec": [3] + std_dec_tail,
            "upsample": ["Down", "Down", "Down", False, "Up", "Up", "Up", False],
        }
    if setup == "256W8":
        # encoder downsamples 2x twice (configs.py:343-381)
        return {
            "layers_enc": [None, ngf, ngf, ngf * 2, ngf * 2, ngf * 2,
                           ngf * 4, ngf * 4, 64],
            "downsample": [True, False, False, False, True, False, False, False],
            "layers_dec": [64, ngf, ngf, ngf * 2, ngf * 2, ngf * 2,
                           ngf * 4, ngf * 4, 3],
            "upsample": [False, False, "Up", False, False, False, "Up", False],
        }
    raise ValueError(f"unknown arch {model_type}")


class ResNetEncoder(nn.Module):
    """architectures.py:91-123."""

    model_type: str = "resnet_256W8UpDown3"
    ngf: int = 64
    spectral: bool = True
    downsample: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = True, noise_scale: float = 1.0):
        arch = get_resnet_arch(self.model_type, self.ngf)
        chans = arch["layers_enc"]
        for l_id in range(1, len(chans)):
            resample = "Down" if (self.downsample and arch["downsample"][l_id - 1]) else None
            x = ResNetBlock(chans[l_id], resample, self.spectral)(
                x, train=train, noise_scale=noise_scale)
        return x


class ResNetDecoder(nn.Module):
    """architectures.py:126-167: refinement decoder with optional residual
    prediction and foreground-mask conditioning channel."""

    model_type: str = "resnet_256W8UpDown3"
    ngf: int = 64
    spectral: bool = True
    predict_residual: bool = True
    normalize_before_residual: bool = False
    use_tanh: bool = True

    @nn.compact
    def __call__(self, x, background_mask=None, *, train: bool = True,
                 noise_scale: float = 1.0):
        arch = get_resnet_arch(self.model_type, self.ngf)
        chans = list(arch["layers_dec"])

        if background_mask is not None:
            fg = (~background_mask).astype(x.dtype)[..., None]
            h = jnp.concatenate([x, fg], axis=-1)
        else:
            h = x

        for l_id in range(1, len(chans)):
            h = ResNetBlock(chans[l_id], arch["upsample"][l_id - 1], self.spectral)(
                h, train=train, noise_scale=noise_scale
            )

        norm = jnp.tanh if self.use_tanh else (lambda v: v)
        if self.predict_residual:
            if self.normalize_before_residual:
                return norm(h) + x
            return norm(h + x)
        return norm(h)
