"""Discretized mixture-of-logistics losses and samplers (NHWC).

Mirrors models/lmconv/utils.py:78-236,422+: the PixelCNN++ output
distribution used when the prior runs directly on RGB instead of VQ codes
(`--vqvae` off, z_buffermodel.py:364-368).  3-channel variant with
channel autoregression (means conditioned on previous sub-pixels), plus the
1-channel variant and the 4-/6-channel layouts (13K / 31K logits,
utils.py:92-99 -- see _COEFF_SLOTS for the reference's coefficient-row
conventions and its 4-channel loss/sampler discrepancy).

Logit layout per mixture (3-channel, nr_mix=K): [K logit probs,
3K means, 3K log scales, 3K coeffs] = 10K channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _log_prob_from_cdf_delta(centered, inv_stdv, bin_half):
    plus = inv_stdv * (centered + bin_half)
    minus = inv_stdv * (centered - bin_half)
    cdf_plus = jax.nn.sigmoid(plus)
    cdf_minus = jax.nn.sigmoid(minus)
    cdf_delta = cdf_plus - cdf_minus
    log_cdf_plus = plus - jax.nn.softplus(plus)           # log cdf at left edge
    log_one_minus_cdf_minus = -jax.nn.softplus(minus)     # log sf at right edge
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - 2.0 * jax.nn.softplus(mid_in)
    # edge cases + low-probability fallback (lmconv/utils.py discretized loss)
    # fallback for tiny bins: pdf at the midpoint times the bin width
    log_delta = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid + jnp.log(2.0 * bin_half),
    )
    return jnp.where(
        centered < -0.999, log_cdf_plus,
        jnp.where(centered > 0.999, log_one_minus_cdf_minus, log_delta),
    )


def discretized_mix_logistic_loss(
    x: jnp.ndarray, logits: jnp.ndarray, n_bits: int = 8, *, reduce_sum: bool = True
) -> jnp.ndarray:
    """x: (B, H, W, 3) in [-1, 1]; logits: (B, H, W, 10*K).  Negative
    log-likelihood (summed, matching the reference's reduction)."""
    B, H, W, C = x.shape
    assert C == 3
    K = logits.shape[-1] // 10
    logit_probs = logits[..., :K]
    rest = logits[..., K:].reshape(B, H, W, 3, 3 * K)
    means = rest[..., :K]
    log_scales = jnp.maximum(rest[..., K: 2 * K], -7.0)
    coeffs = jnp.tanh(rest[..., 2 * K:])

    xx = x[..., None]  # (B,H,W,3,1)
    m0 = means[..., 0, :]
    m1 = means[..., 1, :] + coeffs[..., 0, :] * xx[..., 0, :]
    m2 = (means[..., 2, :] + coeffs[..., 1, :] * xx[..., 0, :]
          + coeffs[..., 2, :] * xx[..., 1, :])
    mean_stack = jnp.stack([m0, m1, m2], axis=3)

    centered = xx - mean_stack
    inv_stdv = jnp.exp(-log_scales)
    bin_half = 1.0 / (2.0 ** n_bits - 1)
    log_probs = _log_prob_from_cdf_delta(centered, inv_stdv, bin_half)
    log_probs = jnp.sum(log_probs, axis=3) + jax.nn.log_softmax(logit_probs, -1)
    ll = jax.nn.logsumexp(log_probs, axis=-1)
    nll = -ll
    return jnp.sum(nll) if reduce_sum else nll


def discretized_mix_logistic_loss_1d(
    x: jnp.ndarray, logits: jnp.ndarray, n_bits: int = 8
) -> jnp.ndarray:
    """1-channel variant (lmconv/utils.py *_1d): logits (B,H,W,3*K)."""
    B, H, W, _ = x.shape
    K = logits.shape[-1] // 3
    logit_probs = logits[..., :K]
    means = logits[..., K: 2 * K]
    log_scales = jnp.maximum(logits[..., 2 * K:], -7.0)
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    bin_half = 1.0 / (2.0 ** n_bits - 1)
    log_probs = _log_prob_from_cdf_delta(centered, inv_stdv, bin_half)
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, -1)
    return -jnp.sum(jax.nn.logsumexp(log_probs, axis=-1))


def _nd_layout(logits, n_channels):
    """Unpack the reference's 4-/6-channel DMOL layouts
    (lmconv/utils.py:92-99,101-105):
      4 channels: 13K = K logit + (4, 3K) [means, scales, coeffs];
      6 channels: 31K = K logit + (6, 5K), with the (6, 3K) coeff block
      reflattened to 16 coefficient rows (utils.py:118-121)."""
    B, H, W, L = logits.shape
    if n_channels == 4:
        K = L // 13
        rest = logits[..., K:].reshape(B, H, W, 4, 3 * K)
        coeffs = jnp.tanh(rest[..., 2 * K: 3 * K])  # (B,H,W,4,K)
    elif n_channels == 6:
        K = L // 31
        rest = logits[..., K:].reshape(B, H, W, 6, 5 * K)
        coeffs = jnp.tanh(rest[..., 2 * K: 5 * K])  # (B,H,W,6,3K)
        coeffs = coeffs.reshape(-1)[: B * H * W * 16 * K].reshape(B, H, W, 16, K)
    else:
        raise ValueError(n_channels)
    logit_probs = logits[..., :K]
    means = rest[..., :K]
    log_scales = jnp.maximum(rest[..., K: 2 * K], -7.0)
    return logit_probs, means, log_scales, coeffs, K


# channel-AR coefficient slots per mean.  6-channel follows the reference's
# 16-row layout exactly (utils.py:131-163: m2:0; m3:1,2; m4:4,5,6; m5:7-10;
# m6:11-15 -- row 3 is unused).  The reference's 4-channel *loss* indexes
# rows 4-6 of a 4-row tensor (utils.py:141-144, out of bounds -- dead code);
# its *sampler* reuses rows 1-3 (utils.py:489-492), which is the runnable
# convention we adopt for both loss and sampler.
_COEFF_SLOTS = {
    4: [[], [0], [1, 2], [1, 2, 3]],
    6: [[], [0], [1, 2], [4, 5, 6], [7, 8, 9, 10], [11, 12, 13, 14, 15]],
}


def _nd_ar_means(means, coeffs, x, n_channels):
    """means/coeffs conditioned on preceding sub-pixels; x: (B,H,W,C,1|K)."""
    out = [means[..., 0, :]]
    for c in range(1, n_channels):
        m = means[..., c, :]
        for j, slot in enumerate(_COEFF_SLOTS[n_channels][c]):
            m = m + coeffs[..., slot, :] * x[..., j, :]
        out.append(m)
    return jnp.stack(out, axis=-2)


def discretized_mix_logistic_loss_nd(
    x: jnp.ndarray, logits: jnp.ndarray, n_bits: int = 8,
    *, reduce_sum: bool = True,
) -> jnp.ndarray:
    """4-/6-channel DMOL negative log-likelihood (lmconv/utils.py:78-163).

    x: (B, H, W, 4|6) in [-1, 1]; logits: (B, H, W, 13K | 31K).
    """
    C = x.shape[-1]
    logit_probs, means, log_scales, coeffs, K = _nd_layout(logits, C)
    xx = x[..., None]
    mean_stack = _nd_ar_means(means, coeffs, xx, C)
    centered = xx - mean_stack
    inv_stdv = jnp.exp(-log_scales)
    bin_half = 1.0 / (2.0 ** n_bits - 1)
    log_probs = _log_prob_from_cdf_delta(centered, inv_stdv, bin_half)
    log_probs = jnp.sum(log_probs, axis=-2) + jax.nn.log_softmax(logit_probs, -1)
    nll = -jax.nn.logsumexp(log_probs, axis=-1)
    return jnp.sum(nll) if reduce_sum else nll


def sample_from_discretized_mix_logistic_nd(
    key: jax.Array, logits: jnp.ndarray, n_channels: int,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Sample (B, H, W, 4|6) from the nd-channel DMOL (utils.py:422-520)."""
    logit_probs, means, log_scales, coeffs, K = _nd_layout(logits, n_channels)
    k1, k2 = jax.random.split(key)
    mix = jax.random.categorical(k1, logit_probs / temperature, axis=-1)
    sel = jax.nn.one_hot(mix, K)
    means = jnp.sum(means * sel[..., None, :], -1)             # (B,H,W,C)
    log_scales = jnp.maximum(
        jnp.sum(log_scales * sel[..., None, :], -1), -7.0)
    coeffs = jnp.sum(coeffs * sel[..., None, :], -1)           # (B,H,W,4|16)

    u = jax.random.uniform(k2, means.shape, minval=1e-5, maxval=1 - 1e-5)
    raw = means + jnp.exp(log_scales) * temperature * (jnp.log(u) - jnp.log1p(-u))
    xs = [jnp.clip(raw[..., 0], -1, 1)]
    for c in range(1, n_channels):
        v = raw[..., c]
        for j, slot in enumerate(_COEFF_SLOTS[n_channels][c]):
            v = v + coeffs[..., slot] * xs[j]
        xs.append(jnp.clip(v, -1, 1))
    return jnp.stack(xs, axis=-1)


def sample_from_discretized_mix_logistic(
    key: jax.Array, logits: jnp.ndarray, temperature: float = 1.0
) -> jnp.ndarray:
    """Sample (B, H, W, 3) in [-1, 1] from 10K-channel DMOL logits
    (lmconv/utils.py:422+)."""
    B, H, W, _ = logits.shape
    K = logits.shape[-1] // 10
    k1, k2 = jax.random.split(key)
    logit_probs = logits[..., :K]
    mix = jax.random.categorical(k1, logit_probs / temperature, axis=-1)
    sel = jax.nn.one_hot(mix, K)

    rest = logits[..., K:].reshape(B, H, W, 3, 3 * K)
    means = jnp.sum(rest[..., :K] * sel[..., None, :], -1)
    log_scales = jnp.maximum(jnp.sum(rest[..., K:2 * K] * sel[..., None, :], -1), -7.0)
    coeffs = jnp.tanh(jnp.sum(rest[..., 2 * K:] * sel[..., None, :], -1))

    u = jax.random.uniform(k2, means.shape, minval=1e-5, maxval=1 - 1e-5)
    x = means + jnp.exp(log_scales) * temperature * (jnp.log(u) - jnp.log1p(-u))
    x0 = jnp.clip(x[..., 0], -1, 1)
    x1 = jnp.clip(x[..., 1] + coeffs[..., 0] * x0, -1, 1)
    x2 = jnp.clip(x[..., 2] + coeffs[..., 1] * x0 + coeffs[..., 2] * x1, -1, 1)
    return jnp.stack([x0, x1, x2], axis=-1)
