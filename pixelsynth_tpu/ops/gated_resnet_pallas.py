"""Fused gated-resnet Pallas kernel (inference fast path).

One kernel evaluates the entire lmconv gated resnet block
(lmconv/layers.py:136-163):

    x = pono(masked_conv_in(concat_elu(og)))
    x += nin_skip(concat_elu(a))          # when a skip activation exists
    y = masked_conv_out(concat_elu(x))
    a', b' = split(y);  out = og + pono(a') * sigmoid(b')

entirely in VMEM: the AR sampling loop launches ~14 of these per PixelCNN
forward, and the unfused path pays kernel-launch + HBM round-trip for each
of its ~6 constituent ops.  Activations for a whole 32x32x80 image are
~160 KB bf16, so everything (both tap-weight stacks included) fits
comfortably.  Equivalent to the Flax GatedResnet with feature_norm='pono'
(tests/test_masked_conv_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixelsynth_tpu.ops.masked_conv_pallas import _use_interpret


def _elu(x):
    # jax.nn.elu lowers through expm1, which Mosaic doesn't implement
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _concat_elu(x):
    return _elu(jnp.concatenate([x, -x], axis=-1))


def _pono(x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    n = x.shape[-1]
    var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / (n - 1)
    return (x - mean) / jnp.sqrt(var + eps)


def _masked_conv_vmem(h, m, w, b, *, G, H, W, k, cdt):
    """h (G*HW, Cin) f32 in VMEM -> (G*HW, Cout) f32; m (G, H, W, k2).

    Elementwise math stays f32 (Mosaic lacks bf16 compares); only the dot
    operands are cast to the compute dtype.  G images fold into the MXU
    rows of every tap dot."""
    half = k // 2
    Cin = h.shape[-1]
    Cout = w.shape[-1]
    hp = jnp.pad(h.reshape(G, H, W, Cin),
                 ((0, 0), (half, half), (half, half), (0, 0)))
    acc = jnp.zeros((G * H * W, Cout), jnp.float32)
    for i in range(k):
        for j in range(k):
            t = i * k + j
            dr, dc = i - half, j - half
            xs = hp[:, half + dr: half + dr + H,
                    half + dc: half + dc + W, :].reshape(G * H * W, Cin)
            z = jnp.dot(xs.astype(cdt), w[t],
                        preferred_element_type=jnp.float32)
            acc = acc + m[:, :, :, t].reshape(G * H * W, 1) * z
    return acc + b


def _kernel(og_ref, a_ref, m_ref, w1_ref, b1_ref, ws_ref, bs_ref, w2_ref,
            b2_ref, out_ref, *, G, H, W, F, k, has_skip, cdt):
    og = og_ref[:].reshape(G * H * W, F)
    m = m_ref[:]
    x = _concat_elu(og)
    x = _masked_conv_vmem(x, m, w1_ref[:], b1_ref[:], G=G, H=H, W=W, k=k,
                          cdt=cdt)
    x = _pono(x)
    if has_skip:
        a = a_ref[:].reshape(G * H * W, F)
        sk = jnp.dot(_concat_elu(a).astype(cdt), ws_ref[:],
                     preferred_element_type=jnp.float32) + bs_ref[:]
        x = x + sk
    x = _concat_elu(x)
    y = _masked_conv_vmem(x, m, w2_ref[:], b2_ref[:], G=G, H=H, W=W, k=k,
                          cdt=cdt)
    a_out = _pono(y[:, :F])
    gate = jax.nn.sigmoid(y[:, F:])
    out_ref[:] = (og + a_out * gate).reshape(G, H, W, F).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def gated_resnet_pallas(
    og: jnp.ndarray,
    a: jnp.ndarray | None,
    mask: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    w_skip: jnp.ndarray | None, b_skip: jnp.ndarray | None,
    w2: jnp.ndarray, b2: jnp.ndarray,
    *,
    compute_dtype: str = "bfloat16",
) -> jnp.ndarray:
    """og/a: (B, H, W, F); mask: (B, k*k, H*W); w1: (k2, 2F, F);
    w_skip: (2F, F) or None; w2: (k2, 2F, 2F)."""
    B, H, W, F = og.shape
    K2 = w1.shape[0]
    k = int(round(K2 ** 0.5))
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    m = mask.reshape(B, K2, H, W).transpose(0, 2, 3, 1)
    has_skip = a is not None
    if a is None:
        a = og  # placeholder operand, unused
        w_skip = jnp.zeros((2 * F, F), cdt)
        b_skip = jnp.zeros((F,), jnp.float32)

    # working set per image (f32): og + a + concat_elu(2F) + padded copy
    # + conv acc (2F) + out, plus the mask
    from pixelsynth_tpu.ops.masked_conv_pallas import pick_batch_group

    per_image = H * W * 4 * (F * 4 + 2 * F * 3 + K2)
    G = pick_batch_group(B, per_image)
    kernel = functools.partial(_kernel, G=G, H=H, W=W, F=F, k=k,
                               has_skip=has_skip, cdt=cdt)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, F), jnp.float32),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, H, W, F), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, W, F), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, W, K2), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, 2 * F, F), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * F, F), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, 2 * F, 2 * F), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * F,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, H, W, F), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(og.astype(jnp.float32), a.astype(jnp.float32), m.astype(jnp.float32),
      w1.astype(cdt), b1.astype(jnp.float32),
      w_skip.astype(cdt), b_skip.astype(jnp.float32),
      w2.astype(cdt), b2.astype(jnp.float32))
