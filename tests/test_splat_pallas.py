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


def test_use_pallas_flag_through_pipeline():
    """SplatConfig.use_pallas routes pipeline splats through the kernel."""
    import jax
    from pixelsynth_tpu.config import Config
    from pixelsynth_tpu.pipeline import PixelSynth

    cfg = Config()
    W = 32
    cfg.model.W = W
    cfg.model.unet_num_filters = 4
    cfg.model.ngf = 8
    cfg.model.lmconv.obs = (3, 4, 4)
    cfg.model.splat.max_points_per_tile = 256
    cfg.model.splat.tile_group = 4
    ps_x = PixelSynth(cfg)
    vs = ps_x.init_variables(jax.random.PRNGKey(0), with_disc=False)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, W, W, 3)) * 2 - 1
    I = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    cams = {"K": I, "Kinv": I, "P_in": I, "Pinv_in": I, "P_out": I}
    depth, _ = ps_x.regress_depth(vs["unet"], img)
    fs_x, bg_x, _ = ps_x.splat_view(img, depth, cams)

    cfg_p = Config.from_dict(cfg.to_dict())
    cfg_p.model.splat.use_pallas = True
    ps_p = PixelSynth(cfg_p)
    fs_p, bg_p, _ = ps_p.splat_view(img, depth, cams)
    np.testing.assert_allclose(np.asarray(fs_p), np.asarray(fs_x),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(bg_p), np.asarray(bg_x))
