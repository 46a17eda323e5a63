"""Locally-masked PixelCNN (lmconv) in Flax, NHWC.

Mirrors the reference OurPixelCNN (models/lmconv/model.py:61-155) with the
PixelSynth instantiation (models/z_buffermodel.py:62-74): nr_resnet=2,
nr_filters=80, kernel 3x3, max_dilation=2, PONO feature norm, no dropout,
512-way logits.  Every convolution is a locally masked conv taking the
per-image mask triple (A-mask for the first layer, B-mask undilated for
resnet streams, B-mask dilated for the dilation streams) in the compact
(B, k*k, H*W) layout -- never channel-repeated (the reference repeats masks
513/160/80x on the host for DataParallel, z_buffermodel.py:697-699).

The up pass appends activations to a skip list consumed in reverse by the
down pass (gated resnets with nin skip fusion, lmconv/layers.py:136-163).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pixelsynth_tpu.models.layers import Nin, concat_elu, order_rescale, pono
from pixelsynth_tpu.ops.masked_conv import locally_masked_conv2d, locally_masked_embed


class LMConv(nn.Module):
    """One locally masked conv layer; weight (k*k, Cin, Cout).

    When `codes`/`filled` are given instead of a dense x, the layer runs
    the embedding-gather fast path (ops.masked_conv.locally_masked_embed);
    `embed_classes` then fixes Cin = classes + 1 (ones padding channel).
    """

    features: int
    kernel: int = 3
    dilation: int = 1
    use_bias: bool = True
    mask_weight: bool = False
    compute_dtype: Optional[str] = None
    embed_classes: Optional[int] = None
    backend: str = "xla"   # xla (differentiable) | pallas (inference fast path)

    @nn.compact
    def __call__(self, x, mask: jnp.ndarray, *, codes=None, filled=None) -> jnp.ndarray:
        k2 = self.kernel * self.kernel
        cin = (self.embed_classes + 1) if self.embed_classes else x.shape[-1]
        # kaiming-uniform fan_in, matching the reference reset_parameters
        # (locally_masked_convolution.py:128-136)
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k2, cin, self.features),
        )

        # bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) matching the reference
        # (locally_masked_convolution.py:133-136).  NOT zeros: the first
        # pixel of every generation order has a blank mask, and a zero bias
        # would leave that position identically zero through every layer --
        # each PONO then amplifies its cotangent by 1/sqrt(eps), which
        # compounds to inf over the ~30 normalization layers.
        def bias_init(key, shape, dtype=jnp.float32):
            bound = 1.0 / jnp.sqrt(jnp.float32(cin * k2))
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        bias = (
            self.param("bias", bias_init, (self.features,))
            if self.use_bias else None
        )
        mw = (
            self.param(
                "mask_weight",
                nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
                (k2, self.features),
            )
            if self.mask_weight else None
        )
        if codes is not None:
            assert self.embed_classes is not None and self.dilation == 1
            return locally_masked_embed(
                codes, filled, mask, weight, bias,
                num_classes=self.embed_classes,
            )
        if self.backend == "pallas" and mw is None:
            from pixelsynth_tpu.ops.masked_conv_pallas import (
                locally_masked_conv2d_pallas_vjp,
            )

            # differentiable (custom VJP) pallas path
            return locally_masked_conv2d_pallas_vjp(
                x, mask, weight,
                bias if bias is not None else jnp.zeros((self.features,)),
                self.dilation, self.compute_dtype or "bfloat16",
            )
        dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        return locally_masked_conv2d(
            x, mask, weight, bias, mw, dilation=self.dilation,
            compute_dtype=dtype,
        )


class FeatureNorm(nn.Module):
    """pono | order_rescale | none (lmconv/layers.py:223-243)."""

    kind: str = "pono"

    @nn.compact
    def __call__(self, x, mask=None):
        if self.kind == "pono":
            return pono(x)
        if self.kind == "order_rescale":
            return order_rescale(x, mask)
        return x


class GatedResnet(nn.Module):
    """gated_resnet (lmconv/layers.py:136-163); optional nin-fused skip."""

    nr_filters: int
    kernel: int = 3
    feature_norm: str = "pono"
    dropout_prob: float = 0.0
    conv_bias: bool = True
    conv_mask_weight: bool = False
    compute_dtype: Optional[str] = None
    backend: str = "xla"

    @nn.compact
    def __call__(self, og_x, a=None, *, mask, train: bool = True):
        F = self.nr_filters
        x = LMConv(F, self.kernel, 1, self.conv_bias, self.conv_mask_weight,
                   compute_dtype=self.compute_dtype,
                   backend=self.backend)(concat_elu(og_x), mask)
        x = FeatureNorm(self.feature_norm)(x, mask)
        if a is not None:
            x = x + Nin(F)(concat_elu(a))
        x = concat_elu(x)
        if self.dropout_prob > 0:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        x = LMConv(2 * F, self.kernel, 1, self.conv_bias, self.conv_mask_weight,
                   compute_dtype=self.compute_dtype, backend=self.backend)(x, mask)
        a_out, b_out = jnp.split(x, 2, axis=-1)
        a_out = FeatureNorm(self.feature_norm)(a_out, mask)
        return og_x + a_out * nn.sigmoid(b_out)


class LMPixelCNN(nn.Module):
    """OurPixelCNN (lmconv/model.py:61-155) -- 512-way code-grid prior."""

    nr_resnet: int = 2
    nr_filters: int = 80
    input_channels: int = 512
    kernel_size: int = 3
    max_dilation: int = 2
    feature_norm: str = "pono"
    dropout_prob: float = 0.0
    conv_bias: bool = True
    conv_mask_weight: bool = False
    num_classes: int = 512
    compute_dtype: Optional[str] = None
    backend: str = "xla"

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray],
        mask_init: jnp.ndarray,
        mask_undilated: jnp.ndarray,
        mask_dilated: jnp.ndarray,
        *,
        codes: Optional[jnp.ndarray] = None,
        filled: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        """x: (B, H, W, input_channels) one-hot codes; masks: (B, k^2, H*W).

        Fast path: pass `codes` (B, H, W) int + `filled` (B, H, W) instead
        of x -- the first layer becomes a per-tap embedding gather (same
        parameters, ~60% fewer FLOPs).  Returns logits (B, H, W,
        num_classes).
        """
        F = self.nr_filters
        k = self.kernel_size

        def conv(feats, dilation=1, embed=False):
            return LMConv(
                feats, k, dilation, self.conv_bias, self.conv_mask_weight,
                compute_dtype=self.compute_dtype,
                embed_classes=self.input_channels if embed else None,
                backend=self.backend,
            )

        def gated(u, a=None):
            return GatedResnet(
                F, k, self.feature_norm, self.dropout_prob,
                self.conv_bias, self.conv_mask_weight,
                compute_dtype=self.compute_dtype, backend=self.backend,
            )(u, a, mask=mask_undilated, train=train)

        norm = FeatureNorm(self.feature_norm)

        ### UP PASS (model.py:131-141)
        # mask_undilated goes to the norm so the center tap keeps
        # OrderRescale's denominator >= 1 (model.py:132-134)
        if codes is not None:
            if filled is None:
                filled = jnp.ones(codes.shape, jnp.float32)
            u0 = conv(F, embed=True)(None, mask_init, codes=codes, filled=filled)
        else:
            # pad channel of ones (model.py:118-129)
            ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
            h = jnp.concatenate([x, ones], axis=-1)
            u0 = conv(F)(h, mask_init)
        u_list: List[jnp.ndarray] = [norm(u0, mask_undilated)]
        for _ in range(2):
            for _ in range(self.nr_resnet):
                u_list.append(gated(u_list[-1]))
            d = conv(F, self.max_dilation)(u_list[-1], mask_dilated)
            u_list.append(norm(d, mask_dilated))
        for _ in range(self.nr_resnet):
            u_list.append(gated(u_list[-1]))

        ### DOWN PASS (model.py:143-151)
        down_nr = [self.nr_resnet, self.nr_resnet + 1, self.nr_resnet + 1]
        u = u_list.pop()
        for i in range(2):
            for _ in range(down_nr[i]):
                u = gated(u, u_list.pop())
            u = conv(F, self.max_dilation)(u, mask_dilated)
            u = norm(u, mask_dilated)
        for _ in range(down_nr[2]):
            u = gated(u, u_list.pop())
        assert not u_list, f"skip list imbalance: {len(u_list)} left"

        return Nin(self.num_classes)(jax.nn.elu(u))
