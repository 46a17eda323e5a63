"""Pallas masked-conv kernel vs the XLA formulations (interpret mode on
CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelsynth_tpu.ops.masked_conv import (
    locally_masked_conv2d,
    locally_masked_conv2d_fused,
)
from pixelsynth_tpu.ops.masked_conv_pallas import locally_masked_conv2d_pallas


@pytest.mark.parametrize("dilation", [1, 2])
def test_pallas_matches_xla(dilation):
    rng = np.random.default_rng(0)
    B, H, W, C, F = 2, 8, 8, 16, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, 9, H * W)) > 0.5, jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((9, C, F)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)
    want = locally_masked_conv2d(x, mask, wgt, bias, dilation=dilation)
    got = locally_masked_conv2d_pallas(
        x, mask, wgt, bias, dilation=dilation, compute_dtype="float32"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    fused = locally_masked_conv2d_fused(x, mask, wgt, bias, dilation=dilation)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pallas_custom_vjp_matches_autodiff():
    import jax

    from pixelsynth_tpu.ops.masked_conv_pallas import (
        locally_masked_conv2d_pallas_vjp,
    )

    rng = np.random.default_rng(1)
    B, H, W, C, F = 1, 8, 8, 8, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, 9, H * W)) > 0.5, jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((9, C, F)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)

    def f_ref(x, w, b):
        return jnp.sum(locally_masked_conv2d(x, mask, w, b, dilation=2) ** 2)

    def f_pal(x, w, b):
        return jnp.sum(
            locally_masked_conv2d_pallas_vjp(x, mask, w, b, 2, "float32") ** 2
        )

    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, wgt, bias)
    gp = jax.grad(f_pal, argnums=(0, 1, 2))(x, wgt, bias)
    for a, b_ in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)
