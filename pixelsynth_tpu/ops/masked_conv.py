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
    patches = unfold_patches(x, k, dilation)              # (B,H,W,Cin,k2)
    m = mask.reshape(B, K2, H, W).transpose(0, 2, 3, 1)   # (B,H,W,k2)
    masked = patches * m[..., None, :]
    out = jnp.einsum(
        "bhwcp,pco->bhwo", masked, weight,
        preferred_element_type=jnp.float32,
    )
    if mask_weight is not None:
        out = out + jnp.einsum("bhwp,po->bhwo", m, mask_weight)
    if bias is not None:
        out = out + bias
    return out
