"""Fused-kernel inference engine for the locally-masked PixelCNN.

Functionally identical forward to `LMPixelCNN.apply` (same parameter
tree!), but composed from the Pallas fast paths:
  * first layer: embedding gather over (codes, filled)
    (ops/masked_conv.locally_masked_embed);
  * every gated resnet: ONE fused kernel (ops/gated_resnet_pallas) --
    two masked convs + PONOs + skip-nin + gating without leaving VMEM;
  * dilated stream convs: the VMEM-resident masked-conv kernel;
  * output nin: one matmul.

This is what the AR sampling loop calls ~400x per view; the Flax module
remains the differentiable path for training, and both consume the same
checkpoint.  Equivalence is asserted in tests/test_lmconv_fast.py.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from pixelsynth_tpu.models.layers import pono
from pixelsynth_tpu.models.lmconv import LMPixelCNN
from pixelsynth_tpu.ops.gated_resnet_pallas import gated_resnet_pallas
from pixelsynth_tpu.ops.masked_conv import locally_masked_embed
from pixelsynth_tpu.ops.masked_conv_pallas import locally_masked_conv2d_pallas


def pixelcnn_forward_fast(
    params: Dict,
    codes: jnp.ndarray,
    filled: jnp.ndarray,
    mask_init: jnp.ndarray,
    mask_undilated: jnp.ndarray,
    mask_dilated: jnp.ndarray,
    *,
    nr_resnet: int = 2,
    max_dilation: int = 2,
    num_classes: int = 512,
    compute_dtype: str = "bfloat16",
) -> jnp.ndarray:
    """params: LMPixelCNN variables['params'].  codes/filled: (B, H, W).
    masks: (B, k^2, H*W).  Returns logits (B, H, W, num_classes)."""

    def gated(name, u, a=None):
        p = params[name]
        w_skip = b_skip = None
        if "Nin_0" in p:
            w_skip = p["Nin_0"]["Dense_0"]["kernel"]
            b_skip = p["Nin_0"]["Dense_0"]["bias"]
        return gated_resnet_pallas(
            u, a, mask_undilated,
            p["LMConv_0"]["weight"], p["LMConv_0"]["bias"],
            w_skip, b_skip,
            p["LMConv_1"]["weight"], p["LMConv_1"]["bias"],
            compute_dtype=compute_dtype,
        )

    def dconv(name, u):
        p = params[name]
        return locally_masked_conv2d_pallas(
            u, mask_dilated, p["weight"], p["bias"],
            dilation=max_dilation, compute_dtype=compute_dtype,
        )

    # first layer (type-A mask) + pono with mask_undilated semantics
    u0 = locally_masked_embed(
        codes, filled, mask_init,
        params["LMConv_0"]["weight"], params["LMConv_0"]["bias"],
        num_classes=num_classes,
    )
    u_list = [pono(u0)]

    g = 0       # gated resnet counter
    d = 1       # dilated LMConv counter (LMConv_0 is u_init)
    ### UP PASS
    for _ in range(2):
        for _ in range(nr_resnet):
            u_list.append(gated(f"GatedResnet_{g}", u_list[-1]))
            g += 1
        u_list.append(pono(dconv(f"LMConv_{d}", u_list[-1])))
        d += 1
    for _ in range(nr_resnet):
        u_list.append(gated(f"GatedResnet_{g}", u_list[-1]))
        g += 1

    ### DOWN PASS
    down_nr = [nr_resnet, nr_resnet + 1, nr_resnet + 1]
    u = u_list.pop()
    for i in range(2):
        for _ in range(down_nr[i]):
            u = gated(f"GatedResnet_{g}", u, u_list.pop())
            g += 1
        u = pono(dconv(f"LMConv_{d}", u))
        d += 1
    for _ in range(down_nr[2]):
        u = gated(f"GatedResnet_{g}", u, u_list.pop())
        g += 1
    assert not u_list

    nin = params["Nin_0"]["Dense_0"]
    h = jax.nn.elu(u)
    return jnp.einsum(
        "bhwf,fc->bhwc", h, nin["kernel"], preferred_element_type=jnp.float32
    ) + nin["bias"]


def fast_logits_fn(pcnn_vars: Dict, masks: jnp.ndarray, model: LMPixelCNN):
    """Convenience: bind masks (B,3,k2,HW) -> (codes, filled) -> logits."""
    params = pcnn_vars["params"]

    def fn(codes, filled):
        return pixelcnn_forward_fast(
            params, codes, filled, masks[:, 0], masks[:, 1], masks[:, 2],
            nr_resnet=model.nr_resnet, max_dilation=model.max_dilation,
            num_classes=model.num_classes,
            compute_dtype=model.compute_dtype or "bfloat16",
        )

    return fn
