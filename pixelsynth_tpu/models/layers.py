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
    """Divide w by its largest singular value, exactly matching torch
    spectral_norm semantics: persistent u/v vectors in "spectral_stats";
    train runs one power iteration (v <- norm(W^T u); u <- norm(W v)),
    eval reuses the stored vectors; sigma = u . (W v) either way.

    With w flattened to mat (d, out) = W_mat^T, torch's updates become
    v = norm(mat @ u) and u = norm(mat^T @ v).
    """
    mat = w.reshape(-1, w.shape[-1])
    vname = "v" + name[1:]

    def u_init():
        # converge at init so a never-trained model still divides by a
        # sane sigma ~ sigma_max (torch converges during its first train
        # forwards; a purely-eval random-init model must not explode)
        u0 = _l2norm(jax.random.normal(module.make_rng("params"),
                                       (mat.shape[-1],)))

        def body(_, u):
            return _l2norm(mat.T @ _l2norm(mat @ u))

        return jax.lax.fori_loop(0, 15, body, u0)

    u_var = module.variable("spectral_stats", name, u_init)
    v_var = module.variable(
        "spectral_stats", vname, lambda: _l2norm(mat @ u_var.value)
    )
    u, v = u_var.value, v_var.value
    if update:
        v = jax.lax.stop_gradient(_l2norm(mat @ u))
        u = jax.lax.stop_gradient(_l2norm(mat.T @ v))
        if module.is_mutable_collection("spectral_stats"):
            u_var.value, v_var.value = u, v
    # sigma = |W v| == torch's u . (W v): torch always refreshes
    # u = normalize(W v) before taking the inner product, in train (after
    # the power iteration) and eval (stored u/v pair) alike.
    sigma = jnp.linalg.norm(mat.T @ jax.lax.stop_gradient(v))
    return w / sigma


def _l2norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x) + eps)


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


class StandingStatsBN(nn.Module):
    """BigGAN BatchNorm_StandingStats (models/layers/normalization.py:95-163,
    selected by norm_G="spectral_batchstanding", architectures.py:45-46).

    Affine gain/bias parameters around a BN whose stored stats can either
    track a running average (momentum 0.1, torch convention) or *accumulate*
    standing statistics: in accumulate mode, train-time means/vars are summed
    into the stored buffers with a counter, and eval divides by the counter.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1  # torch convention: new = old*(1-m) + batch*m

    @nn.compact
    def __call__(self, x, *, train: bool = True, accumulate_standing: bool = False):
        gain = self.param("gain", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean_v = self.variable("batch_stats", "stored_mean",
                               lambda: jnp.zeros((self.features,)))
        var_v = self.variable("batch_stats", "stored_var",
                              lambda: jnp.ones((self.features,)))
        cnt_v = self.variable("batch_stats", "accumulation_counter",
                              lambda: jnp.zeros((1,)))
        if train:
            # mean-of-squares minus mean-squared, like manual_bn
            m = jnp.mean(x, axis=(0, 1, 2))
            m2 = jnp.mean(x ** 2, axis=(0, 1, 2))
            var = m2 - m ** 2
            if not self.is_initializing() and self.is_mutable_collection("batch_stats"):
                if accumulate_standing:
                    mean_v.value = mean_v.value + m
                    var_v.value = var_v.value + var
                    cnt_v.value = cnt_v.value + 1.0
                else:
                    mean_v.value = mean_v.value * (1 - self.momentum) + m * self.momentum
                    var_v.value = var_v.value * (1 - self.momentum) + var * self.momentum
        else:
            m, var = mean_v.value, var_v.value
            if accumulate_standing:
                m = m / cnt_v.value
                var = var / cnt_v.value
        scale = jax.lax.rsqrt(var + self.eps) * gain
        return x * scale - (m * scale - bias)


class NoiseBN(nn.Module):
    """BigGAN noise-conditioned BatchNorm (normalization.py:21-47).

    Gains/biases are predicted from a fresh (B, noise_sz) standard-normal
    draw taken from the 'noise' RNG stream.
    """

    features: int
    noise_sz: int = 20
    spectral: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = True, noise=None,
                 noise_scale: float = 1.0):
        zero_noise = (noise is None and isinstance(noise_scale, (int, float))
                      and noise_scale == 0.0)
        if noise is None and zero_noise:
            # deterministic eval: gain=1, bias=0 without consuming an rng
            # (the reference draws fresh noise at EVERY forward,
            # normalization.py:21-47, so its eval PSNR is noise-capped)
            noise = jnp.zeros((x.shape[0], self.noise_sz), x.dtype)
        elif noise is None:
            noise = jax.random.normal(
                self.make_rng("noise"), (x.shape[0], self.noise_sz), x.dtype
            )
            if not (isinstance(noise_scale, (int, float)) and noise_scale == 1.0):
                noise = noise * noise_scale
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
    def __call__(self, x, *, train: bool = True, noise_scale: float = 1.0):
        in_c = x.shape[-1]

        def resample(h):
            if self.resample == "Down" or self.resample is True:
                return avg_pool(h, 3, 2, 1)
            if self.resample == "Up":
                return upsample2x(h)
            return h

        h = NoiseBN(in_c, spectral=self.spectral)(x, train=train,
                                                  noise_scale=noise_scale)
        h = nn.relu(h)
        h = SNConv(self.features, 3, 1, 1, spectral=self.spectral)(h, train=train)
        h = NoiseBN(self.features, spectral=self.spectral)(h, train=train,
                                                           noise_scale=noise_scale)
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
