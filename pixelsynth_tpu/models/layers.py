"""Shared model layers (Flax/linen, NHWC).

TPU-native redesigns of the reference's layer zoo:
  * spectral-norm convs (models/networks/utilities.py:7-10) via
    flax.linen.SpectralNorm power iteration;
  * synchronized BatchNorm: under pjit/GSPMD the batch statistics of a
    sharded batch are global automatically, so `nn.BatchNorm` is the whole
    replacement for the reference's 800-line master/slave-pipe
    sync_batchnorm package (models/networks/sync_batchnorm/);
  * BigGAN-style noise-conditioned BN (models/layers/normalization.py:21-47);
  * the BigGAN ResNet block (models/layers/blocks.py:33-73);
  * lmconv primitives: concat_elu, nin (1x1 linear), PONO positional norm,
    OrderRescale (models/lmconv/layers.py:17-243).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample, NHWC (torch nn.Upsample(align_corners=False))."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")


def avg_pool(x: jnp.ndarray, k: int, stride: int, padding: int = 0) -> jnp.ndarray:
    return nn.avg_pool(
        x, (k, k), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )


def _spectral_normalize(module: nn.Module, w: jnp.ndarray, name: str,
                        update: bool) -> jnp.ndarray:
    """Divide w by its largest singular value (one power-iteration step).

    Stateless-friendly re-implementation of torch spectral_norm (the flax
    wrapper mutates its u vector even in eval mode); the persistent u lives
    in the "spectral_stats" collection and is only written when that
    collection is mutable and `update` is set.
    """
    mat = w.reshape(-1, w.shape[-1])
    u_var = module.variable(
        "spectral_stats", name,
        lambda: jax.random.normal(module.make_rng("params"), (mat.shape[-1],)),
    )
    u = u_var.value
    # one power iteration
    v = mat @ u
    v = v / (jnp.linalg.norm(v) + 1e-12)
    u_new = mat.T @ v
    u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
    u_new = jax.lax.stop_gradient(u_new)
    v = jax.lax.stop_gradient(mat @ u_new)
    sigma = jnp.linalg.norm(v)
    if update and module.is_mutable_collection("spectral_stats"):
        u_var.value = u_new
    return w / (sigma + 1e-12)


class SNConv(nn.Module):
    """Conv2D with optional spectral normalization (power iteration)."""

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    spectral: bool = True
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        if self.spectral:
            kernel = _spectral_normalize(self, kernel, "u", train)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype) if self.dtype else x,
            kernel.astype(self.dtype) if self.dtype else kernel,
            window_strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            out = out + bias
        return out


class SyncBatchNorm(nn.Module):
    """BatchNorm whose statistics are global across the sharded batch.

    One line replaces the reference's three mechanisms (DataParallel SyncBN
    pipes, DDP broadcast, plain BN): under pjit, reductions over a
    data-sharded batch lower to cross-replica collectives over ICI.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            axis_name=self.axis_name,
        )(x)


class NoiseBN(nn.Module):
    """BigGAN noise-conditioned BatchNorm (normalization.py:21-47).

    Gains/biases are predicted from a fresh (B, noise_sz) standard-normal
    draw taken from the 'noise' RNG stream.
    """

    features: int
    noise_sz: int = 20
    spectral: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        noise = jax.random.normal(
            self.make_rng("noise"), (x.shape[0], self.noise_sz), x.dtype
        )
        wg = self.param(
            "gain_kernel", nn.initializers.lecun_normal(), (self.noise_sz, self.features)
        )
        wb = self.param(
            "bias_kernel", nn.initializers.lecun_normal(), (self.noise_sz, self.features)
        )
        if self.spectral:
            wg = _spectral_normalize(self, wg, "u_gain", train)
            wb = _spectral_normalize(self, wb, "u_bias", train)
        gain = 1.0 + noise @ wg
        bias = noise @ wb
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            use_scale=False, use_bias=False,
        )(x)
        return h * gain[:, None, None, :] + bias[:, None, None, :]


class ResNetBlock(nn.Module):
    """BigGAN ResNet block (models/layers/blocks.py:33-73).

    ch_a: NoiseBN -> ReLU -> 3x3 conv -> NoiseBN -> ReLU -> 3x3 conv -> resample
    ch_b: 1x1 conv -> resample (identity when shape/channel preserving).
    resample in {None, "Down", "Up"}.
    """

    features: int
    resample: Optional[str] = None
    spectral: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        in_c = x.shape[-1]

        def resample(h):
            if self.resample == "Down" or self.resample is True:
                return avg_pool(h, 3, 2, 1)
            if self.resample == "Up":
                return upsample2x(h)
            return h

        h = NoiseBN(in_c, spectral=self.spectral)(x, train=train)
        h = nn.relu(h)
        h = SNConv(self.features, 3, 1, 1, spectral=self.spectral)(h, train=train)
        h = NoiseBN(self.features, spectral=self.spectral)(h, train=train)
        h = nn.relu(h)
        h = SNConv(self.features, 3, 1, 1, spectral=self.spectral)(h, train=train)
        h = resample(h)

        if self.resample or in_c != self.features:
            s = SNConv(self.features, 1, 1, 0, spectral=self.spectral)(x, train=train)
            s = resample(s)
        else:
            s = x
        return h + s


# ---------------------------------------------------------------------------
# lmconv primitives
# ---------------------------------------------------------------------------


def concat_elu(x: jnp.ndarray) -> jnp.ndarray:
    """elu(concat(x, -x)) along channels (lmconv/utils.py concat_elu)."""
    return jax.nn.elu(jnp.concatenate([x, -x], axis=-1))


def pono(x: jnp.ndarray, epsilon: float = 1e-5) -> jnp.ndarray:
    """Positional normalization over channels (lmconv/layers.py:231-243).

    Matches the reference's torch.var default (unbiased / ddof=1).
    """
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True, ddof=1)
    return (x - mean) / jnp.sqrt(var + epsilon)


def order_rescale(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Divide by the per-location count of visible taps (layers.py:223-228).

    mask: (B, k*k, H*W).
    """
    B, H, W, _ = x.shape
    scale = jnp.sum(mask, axis=1).reshape(B, H, W, 1)
    return x / scale


class Nin(nn.Module):
    """1x1 'network in network' linear layer (lmconv/layers.py:20-38)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features)(x)
