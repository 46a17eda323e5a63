"""Pallas splat blend vs the XLA splatter (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelsynth_tpu.config import SplatConfig
from pixelsynth_tpu.ops.splat import splat
from pixelsynth_tpu.ops.splat_pallas import splat_pallas


@pytest.mark.parametrize("accumulation", ["alphacomposite", "wsum", "wsumnorm"])
def test_splat_pallas_matches_xla(accumulation):
    rng = np.random.default_rng(0)
    W, B, N, C = 32, 1, 400, 3
    cfg = SplatConfig(
        accumulation=accumulation, max_points_per_tile=128,
        tile_size=16, tile_group=4, background_smoothing_kernel_size=5,
    )
    pts = np.stack([
        rng.uniform(-2, W + 1, (B, N)),
        rng.uniform(-2, W + 1, (B, N)),
        rng.uniform(0.5, 10.0, (B, N)),
    ], -1).astype(np.float32)
    feats = rng.standard_normal((B, N, C)).astype(np.float32)
    valid = np.ones((B, N), bool)

    want, bg_want = splat(jnp.asarray(pts), jnp.asarray(feats),
                          jnp.asarray(valid), W=W, cfg=cfg)
    got, bg_got = splat_pallas(jnp.asarray(pts), jnp.asarray(feats),
                               jnp.asarray(valid), W=W, cfg=cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(bg_got), np.asarray(bg_want))


def test_splat_pallas_k_cap():
    W = 32
    cfg = SplatConfig(accumulation="wsum", pp_pixel=1, max_points_per_tile=128,
                      tile_size=16, background_smoothing_kernel_size=1)
    pts = jnp.array([[[16.0, 16.0, 5.0], [16.0, 16.0, 1.0]]])
    feats = jnp.ones((1, 2, 1))
    valid = jnp.ones((1, 2), bool)
    out, _ = splat_pallas(pts, feats, valid, W=W, cfg=cfg)
    cfg2 = SplatConfig(accumulation="wsum", pp_pixel=2, max_points_per_tile=128,
                       tile_size=16, background_smoothing_kernel_size=1)
    out2, _ = splat_pallas(pts, feats, valid, W=W, cfg=cfg2)
    assert float(out2[0, 16, 16, 0]) > float(out[0, 16, 16, 0]) + 0.5


def test_splat_pallas_gradients():
    """The pallas-forward splat is differentiable (backward = XLA VJP)."""
    import jax

    rng = np.random.default_rng(2)
    W, B, N, C = 32, 1, 64, 2
    cfg = SplatConfig(max_points_per_tile=128, tile_size=16,
                      background_smoothing_kernel_size=1)
    pts = jnp.asarray(np.stack([
        rng.uniform(0, W, (B, N)), rng.uniform(0, W, (B, N)),
        rng.uniform(0.5, 10, (B, N))], -1), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    valid = jnp.ones((B, N), bool)

    def loss_p(p, f):
        out, _ = splat_pallas(p, f, valid, W=W, cfg=cfg)
        return jnp.sum(out ** 2)

    def loss_x(p, f):
        out, _ = splat(p, f, valid, W=W, cfg=cfg)
        return jnp.sum(out ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(pts, feats)
    gx = jax.grad(loss_x, argnums=(0, 1))(pts, feats)
    np.testing.assert_allclose(np.asarray(gp[0][..., :2]),
                               np.asarray(gx[0][..., :2]), atol=1e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               atol=1e-3, rtol=1e-2)
