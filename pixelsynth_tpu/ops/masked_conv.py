"""Locally masked convolution as a fused XLA op.

The reference implements this as a custom autograd Function doing
unfold(im2col) -> mask multiply (broadcast over C_in) -> matmul, with a
hand-written backward to avoid storing the unfolded tensor
(models/lmconv/locally_masked_convolution.py:9-93).

On TPU the same computation is one `conv_general_dilated_patches` + mask
multiply + contraction; XLA fuses it and differentiates it for free (the
reference's memory-saving backward corresponds to XLA rematerializing the
unfold, which we get with jax.checkpoint when desired).  Masks stay in their
compact (B, k*k, H*W) layout and broadcast over input channels in-kernel --
the reference instead materializes channel-repeated masks on the host
(models/z_buffermodel.py:697-699), which we deliberately avoid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unfold_patches(x: jnp.ndarray, k: int, dilation: int = 1) -> jnp.ndarray:
    """Extract kxk patches: (B, H, W, C) -> (B, H, W, C, k*k).

    'SAME' padding with dilation matches the reference's
    pad = dilation*(k-1)//2 (locally_masked_convolution.py:117-119).
    """
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(k, k),
        window_strides=(1, 1),
        padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B, H, W, CK = patches.shape
    C = x.shape[-1]
    # conv_general_dilated_patches orders output channels with the input
    # channel dimension major: index = c * k*k + patch_pos (row-major).
    return patches.reshape(B, H, W, C, k * k)


def locally_masked_conv2d(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    mask_weight: jnp.ndarray | None = None,
    *,
    dilation: int = 1,
    compute_dtype=None,
) -> jnp.ndarray:
    """Convolution whose kernel support is masked per output location.

    Args:
      x: (B, H, W, Cin).
      mask: (B, k*k, H*W) float -- one {0,1} entry per kernel tap per output
        location, kernel taps in row-major (dy, dx) order (the layout of
        masking.get_unfolded_masks, models/lmconv/masking.py:343-349).
      weight: (k*k, Cin, Cout).
      bias: (Cout,) or None.
      mask_weight: (k*k, Cout) or None -- learned conditioning on the mask
        itself (locally_masked_convolution.py:44-46).
    Returns:
      (B, H, W, Cout).
    """
    B, H, W, Cin = x.shape
    K2 = weight.shape[0]
    k = int(round(K2 ** 0.5))
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weight = weight.astype(compute_dtype)
    patches = unfold_patches(x, k, dilation)              # (B,H,W,Cin,k2)
    m = mask.reshape(B, K2, H, W).transpose(0, 2, 3, 1).astype(patches.dtype)
    masked = patches * m[..., None, :]
    out = jnp.einsum(
        "bhwcp,pco->bhwo", masked, weight,
        preferred_element_type=jnp.float32,
    )
    if mask_weight is not None:
        out = out + jnp.einsum(
            "bhwp,po->bhwo", m, mask_weight.astype(m.dtype),
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        out = out + bias
    return out.astype(jnp.float32)


def locally_masked_conv2d_fused(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    mask_weight: jnp.ndarray | None = None,
    *,
    dilation: int = 1,
    compute_dtype=None,
) -> jnp.ndarray:
    """Same op as `locally_masked_conv2d`, restructured for TPU:

      out[p] = sum_t mask_t[p] * (x W_t)[p + off_t]

    -- ONE (BHW, Cin) @ (Cin, k^2*Cout) matmul produces every tap's
    contribution z_t at every position, then k^2 shifted slices of z are
    mask-scaled and summed on the VPU.  This avoids materializing the
    im2col patch tensor (k^2 * activations of HBM traffic) that the
    unfold formulation writes, reads for masking, and re-reads for the
    contraction.  ~2x faster at PixelSynth sizes; exactly equivalent
    (tests/test_sampling.py, tests/test_ops.py).
    """
    B, H, W, Cin = x.shape
    K2, _, Cout = weight.shape
    k = int(round(K2 ** 0.5))
    half = k // 2
    xc = x.astype(compute_dtype) if compute_dtype else x
    wc = weight.astype(compute_dtype) if compute_dtype else weight
    # z[b,h,w,t,f] = sum_c x[b,h,w,c] W[t,c,f]
    z = jnp.einsum("bhwc,tcf->bhwtf", xc, wc,
                   preferred_element_type=jnp.float32)
    pad = half * dilation
    zp = jnp.pad(z, ((0, 0), (pad, pad), (pad, pad), (0, 0), (0, 0)))
    m = mask.reshape(B, K2, H, W).transpose(0, 2, 3, 1)  # (B,H,W,k2)

    out = jnp.zeros((B, H, W, Cout), jnp.float32)
    for i, dr in enumerate(range(-half, half + 1)):
        for j, dc in enumerate(range(-half, half + 1)):
            t = i * k + j
            # out[p] needs z_t at p + off; reading zp at (pad + dr*dil)
            # offset yields exactly that window
            zt = jax.lax.dynamic_slice(
                zp, (0, pad + dr * dilation, pad + dc * dilation, t, 0),
                (B, H, W, 1, Cout),
            )[:, :, :, 0, :]
            out = out + m[..., t, None] * zt
    if mask_weight is not None:
        out = out + jnp.einsum("bhwp,po->bhwo", m, mask_weight,
                               preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


def locally_masked_embed(
    codes: jnp.ndarray,
    filled: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    num_classes: int,
) -> jnp.ndarray:
    """First-layer locally masked conv specialized for one-hot code input.

    The PixelCNN's input is one-hot codes plus a ones padding channel
    (model.py:118-129), so its 513-channel first conv is mathematically a
    per-tap table lookup:

      out[p] = bias + sum_tap mask[tap,p] * (W[tap, code[p+off]] + W[tap, ones])

    for filled positions, and W[tap, ones] alone for positions not yet
    sampled (their one-hot rows are zeroed during sampling, sample.py:47).
    This removes ~60% of the PixelCNN's FLOPs (the 513->F conv dominates)
    and lets the sampler carry compact integer state instead of a one-hot
    tensor.  Exactly equivalent to `locally_masked_conv2d` on the one-hot
    input (see tests/test_lmconv_fast.py).

    Args:
      codes: (B, H, W) int32; filled: (B, H, W) bool/float -- whether the
        position's one-hot row is present; mask: (B, k*k, H*W);
      weight: (k*k, num_classes + 1, F) -- the trailing input channel is
        the ones padding channel.
    """
    B, H, W = codes.shape
    K2 = weight.shape[0]
    k = int(round(K2 ** 0.5))
    half = k // 2
    F = weight.shape[-1]
    m = mask.reshape(B, K2, H, W).transpose(0, 2, 3, 1)   # (B,H,W,k2)
    fil = filled.astype(weight.dtype)

    pad_codes = jnp.pad(codes, ((0, 0), (half, half), (half, half)))
    pad_fil = jnp.pad(fil, ((0, 0), (half, half), (half, half)))

    out = jnp.zeros((B, H, W, F), weight.dtype)
    ones_row = weight[:, num_classes, :]                  # (k2, F)
    for i, dr in enumerate(range(-half, half + 1)):
        for j, dc in enumerate(range(-half, half + 1)):
            t = i * k + j
            c_t = jax.lax.dynamic_slice(
                pad_codes, (0, half + dr, half + dc), (B, H, W))
            f_t = jax.lax.dynamic_slice(
                pad_fil, (0, half + dr, half + dc), (B, H, W))
            contrib = jnp.take(weight[t], c_t, axis=0) * f_t[..., None]
            contrib = contrib + ones_row[t]
            out = out + m[..., t, None] * contrib
    if bias is not None:
        out = out + bias
    return out.astype(jnp.float32)
