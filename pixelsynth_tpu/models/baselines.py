"""Alternative view-synthesis baselines (NHWC).

Mirrors models/encoderdecoder.py:26-294: the ViewAppearanceFlow baseline
(encode image + relative pose -> predict a flow field -> bilinear warp the
input) and the Tatarchenko encoder-decoder (direct pixel regression),
selectable via ModelConfig.model_type just like the reference's
--model_type flag (options/options.py:9-16)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling (torch F.grid_sample semantics, align_corners=True).

    img: (B, H, W, C); grid: (B, H, W, 2) with (x, y) in [-1, 1].
    Out-of-range samples clamp to the border.
    """
    B, H, W, C = img.shape
    x = (grid[..., 0] + 1.0) * (W - 1) / 2.0
    y = (grid[..., 1] + 1.0) * (H - 1) / 2.0
    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(y - y0, 0.0, 1.0)[..., None]

    def gather(yy, xx):
        idx = (yy * W + xx).astype(jnp.int32).reshape(B, -1)
        flat = img.reshape(B, H * W, C)
        return jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(B, H, W, C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


class _ConvEncoder(nn.Module):
    """6 stride-2 convs 16..512 + 2 FC 4096 (encoderdecoder.py:34-60)."""

    act: str = "relu"

    @nn.compact
    def __call__(self, x, *, train=True):
        act = nn.relu if self.act == "relu" else (lambda h: nn.leaky_relu(h, 0.2))
        for feats in (16, 32, 64, 128, 256, 512):
            x = nn.Conv(feats, (3, 3), strides=2, padding=1)(x)
            x = act(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
        x = x.reshape(x.shape[0], -1)
        for _ in range(2):
            x = nn.Dense(4096)(x)
            x = act(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
        return x


class _ConvDecoder(nn.Module):
    """2 FC -> 8x8x64 -> 5 upsample+conv stages (encoderdecoder.py:62-92)."""

    out_channels: int = 2
    act: str = "relu"

    @nn.compact
    def __call__(self, x, *, train=True):
        act = nn.relu if self.act == "relu" else (lambda h: nn.leaky_relu(h, 0.2))
        for _ in range(2):
            x = nn.Dense(4096)(x)
            x = act(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
        x = x.reshape(x.shape[0], 8, 8, 64)
        x = nn.Conv(256, (3, 3), padding=1)(x)
        x = act(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        for feats in (128, 64, 32, 16):
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, 2 * H, 2 * W, C), "nearest")
            x = nn.Conv(feats, (3, 3), padding=1)(x)
            x = act(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), "nearest")
        x = nn.Conv(self.out_channels, (3, 3), padding=1)(x)
        return jnp.tanh(x)


class _AngleTransformer(nn.Module):
    out_dim: int = 256

    @nn.compact
    def __call__(self, rt_flat, *, train=True):
        x = nn.Dense(128)(rt_flat)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.Dense(self.out_dim)(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return x


class ViewAppearanceFlow(nn.Module):
    """Flow-prediction baseline (encoderdecoder.py:26-182)."""

    @nn.compact
    def __call__(self, input_img, input_RTinv, output_RT, *, train=True):
        RT = (input_RTinv @ output_RT)[:, 0:3, :]
        fs = _ConvEncoder("relu")(input_img, train=train)
        fs_angle = _AngleTransformer(256)(RT.reshape(RT.shape[0], -1), train=train)
        fs = jnp.concatenate([fs, fs_angle], axis=-1)
        flow = _ConvDecoder(2, "relu")(fs, train=train)  # (B, H, W, 2) in [-1,1]
        return grid_sample(input_img, flow)


class Tatarchenko(nn.Module):
    """Direct pixel-regression baseline (encoderdecoder.py:202-294)."""

    @nn.compact
    def __call__(self, input_img, input_RTinv, output_RT, *, train=True):
        RT = (input_RTinv @ output_RT)[:, 0:3, :]
        fs = _ConvEncoder("leaky")(input_img, train=train)
        fs_angle = _AngleTransformer(64)(RT.reshape(RT.shape[0], -1), train=train)
        fs = jnp.concatenate([fs, fs_angle], axis=-1)
        return _ConvDecoder(3, "leaky")(fs, train=train)
