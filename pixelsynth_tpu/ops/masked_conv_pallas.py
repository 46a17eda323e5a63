"""Pallas TPU kernel for the locally masked convolution.

The XLA formulations (ops/masked_conv.py) are HBM-bound: either the im2col
patch tensor or the per-tap product tensor (k^2 x activations) round-trips
through HBM for every one of the PixelCNN's ~30 conv layers.  At PixelSynth
sizes the whole activation grid of one image is tiny (32x32x160 bf16 =
320 KB), so this kernel keeps x, the mask, and all tap weights resident in
VMEM, runs one (HW, Cin) @ (Cin, Cout) MXU matmul per tap on the
shifted-in-VMEM activations, and accumulates mask-scaled results in a VMEM
scratch -- x is read from HBM exactly once and out written once.

Grid: one program per batch element.  Equivalent to
ops.masked_conv.locally_masked_conv2d (tests/test_masked_conv_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, m_ref, w_ref, b_ref, out_ref, *, G, H, W, Cin, Cout, k,
            dilation, acc_dtype):
    """One program = G images: the per-tap dot is (G*H*W, Cin) @ (Cin, Cout),
    folding the candidate population into MXU rows.  G=1 reproduces the
    round-2 per-image kernel; at population sizes the per-image grid was
    the bottleneck -- 16 serialized tiny-matmul programs per launch."""
    half = k // 2
    pad = half * dilation
    x = x_ref[:]                      # (G, H, W, Cin)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    acc = jnp.zeros((G * H * W, Cout), acc_dtype)
    for i in range(k):
        for j in range(k):
            t = i * k + j
            dr = (i - half) * dilation
            dc = (j - half) * dilation
            xs = xp[:, pad + dr: pad + dr + H,
                    pad + dc: pad + dc + W, :].reshape(G * H * W, Cin)
            z = jnp.dot(xs, w_ref[t], preferred_element_type=acc_dtype)
            mt = m_ref[:, :, :, t].reshape(G * H * W, 1).astype(acc_dtype)
            acc = acc + mt * z
    acc = acc + b_ref[:].astype(acc_dtype)
    out_ref[:] = acc.reshape(G, H, W, Cout).astype(out_ref.dtype)


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def pick_batch_group(B: int, per_image_bytes: int,
                     budget: int | None = None) -> int:
    """Largest divisor of B whose VMEM working set fits the budget.

    Mosaic's scoped-vmem accounting charges roughly 2x the naive block
    estimate (double buffering + slice temporaries), so the default budget
    is deliberately conservative; PIXELSYNTH_PALLAS_GROUP forces a value
    for tuning."""
    import os

    forced = os.environ.get("PIXELSYNTH_PALLAS_GROUP")
    if forced:
        g = min(B, int(forced))
        while B % g:
            g -= 1
        return g
    if budget is None:
        budget = 4 * 2 ** 20
    g = max(1, min(B, budget // max(per_image_bytes, 1)))
    while B % g:
        g -= 1
    return g


# ---------------------------------------------------------------------------
# differentiable wrapper
# ---------------------------------------------------------------------------
#
# Backward math for out[p] = sum_t m_t[p] * (x[p + o_t] @ W_t) + b:
#   dx[q] = sum_t (m_t * g)[q - o_t] @ W_t^T    -- the same masked-conv
#           shape with *flipped* taps, transposed weights, and the mask
#           pre-applied to the cotangent (so the conv itself runs with an
#           all-ones mask);
#   dW_t  = x_shift_t^T @ (m_t * g)             -- nine (Cin, HW)x(HW, Cout)
#           matmuls (cheap, done in XLA);
#   db    = sum_p g[p].
# This reproduces the reference's hand-written autograd Function
# (locally_masked_convolution.py:52-93) against the Pallas forward.


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def locally_masked_conv2d_pallas_vjp(x, mask, weight, bias, dilation=1,
                                     compute_dtype="bfloat16"):
    return locally_masked_conv2d_pallas(
        x, mask, weight, bias, dilation=dilation, compute_dtype=compute_dtype
    )


def _lmconv_fwd(x, mask, weight, bias, dilation, compute_dtype):
    out = locally_masked_conv2d_pallas(
        x, mask, weight, bias, dilation=dilation, compute_dtype=compute_dtype
    )
    return out, (x, mask, weight)


def _lmconv_bwd(dilation, compute_dtype, res, g):
    x, mask, weight = res
    B, H, W, Cin = x.shape
    K2, _, Cout = weight.shape
    k = int(round(K2 ** 0.5))
    half = k // 2
    m4 = mask.reshape(B, K2, H, W).transpose(0, 2, 3, 1)      # (B,H,W,k2)
    mg = g[..., None, :] * m4[..., :, None]                   # (B,H,W,k2,Cout)

    # dx[q] = sum_t (m_t * g)[q - o_t] @ W_t^T -- read each tap's
    # mask-scaled cotangent at the negated offset
    pad = half * dilation
    mgp = jnp.pad(mg, ((0, 0), (pad, pad), (pad, pad), (0, 0), (0, 0)))
    dx = jnp.zeros((B, H, W, Cin), jnp.float32)
    for i in range(k):
        for j in range(k):
            t = i * k + j
            dr = (i - half) * dilation
            dc = (j - half) * dilation
            sl = jax.lax.dynamic_slice(
                mgp, (0, pad - dr, pad - dc, t, 0), (B, H, W, 1, Cout)
            )[:, :, :, 0, :]
            dx = dx + jnp.einsum("bhwo,co->bhwc", sl, weight[t],
                                 preferred_element_type=jnp.float32)

    # dW: per-tap correlation of shifted x with the mask-scaled cotangent
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    dW = []
    for i in range(k):
        for j in range(k):
            t = i * k + j
            dr = (i - half) * dilation
            dc = (j - half) * dilation
            xs = jax.lax.dynamic_slice(
                xp, (0, pad + dr, pad + dc, 0), (B, H, W, Cin))
            dW.append(jnp.einsum("bhwc,bhwo->co", xs, mg[..., t, :],
                                 preferred_element_type=jnp.float32))
    dW = jnp.stack(dW, axis=0)
    db = jnp.sum(g, axis=(0, 1, 2))
    return dx, None, dW, db


locally_masked_conv2d_pallas_vjp.defvjp(_lmconv_fwd, _lmconv_bwd)


@functools.partial(jax.jit, static_argnames=("dilation", "compute_dtype"))
def locally_masked_conv2d_pallas(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    dilation: int = 1,
    compute_dtype: str = "bfloat16",
) -> jnp.ndarray:
    """x: (B, H, W, Cin); mask: (B, k*k, H*W); weight: (k*k, Cin, Cout)."""
    B, H, W, Cin = x.shape
    K2, _, Cout = weight.shape
    k = int(round(K2 ** 0.5))
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    m = mask.reshape(B, K2, H, W).transpose(0, 2, 3, 1)  # (B,H,W,k2)
    if bias is None:
        bias = jnp.zeros((Cout,), jnp.float32)

    # x (cdt) + padded copy + mask + f32 acc + out
    itemsize = 2 if cdt == jnp.bfloat16 else 4
    per_image = H * W * (Cin * 2 * itemsize + K2 * itemsize + Cout * 8)
    G = pick_batch_group(B, per_image)
    kernel = functools.partial(
        _kernel, G=G, H=H, W=W, Cin=Cin, Cout=Cout, k=k, dilation=dilation,
        acc_dtype=jnp.float32,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), jnp.float32),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, H, W, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, W, K2), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, Cin, Cout), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout,), lambda b: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, H, W, Cout), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(x.astype(cdt), m.astype(cdt), weight.astype(cdt), bias)
