"""End-to-end pipeline tests at W=64 (levels=6 U-Net, 8x8 code grid)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelsynth_tpu.config import Config
from pixelsynth_tpu.pipeline import CloudState, PixelSynth
from pixelsynth_tpu.train.dpr import create_dpr_state, make_dpr_train_step


def tiny_config(W=64):
    cfg = Config()
    cfg.model.W = W
    cfg.model.unet_num_filters = 4
    cfg.model.ngf = 8
    cfg.model.ndf = 8
    cfg.model.vqvae.channel = 16
    cfg.model.vqvae.n_res_channel = 8
    cfg.model.lmconv.nr_filters = 16
    cfg.model.lmconv.obs = (3, W // 8, W // 8)
    cfg.model.splat.max_points_per_tile = 1024
    cfg.model.splat.tile_group = 4
    return cfg


@pytest.fixture(scope="module")
def ps_and_vars():
    cfg = tiny_config()
    ps = PixelSynth(cfg)
    vs = ps.init_variables(jax.random.PRNGKey(0))
    return ps, vs


def make_batch(B, W, key=None):
    key = key or jax.random.PRNGKey(1)
    img = jax.random.uniform(key, (B, W, W, 3)) * 2 - 1
    I = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    return {"input_img": img, "output_img": img, "K": I, "Kinv": I,
            "P_in": I, "Pinv_in": I, "P_out": I, "Pinv_out": I}


def test_render_no_outpaint(ps_and_vars):
    ps, vs = ps_and_vars
    batch = make_batch(1, ps.W)
    cams = {k: batch[k] for k in ("K", "Kinv", "P_in", "Pinv_in", "P_out")}
    out = ps.render_no_outpaint(vs, batch["input_img"], cams,
                                rngs={"noise": jax.random.PRNGKey(2)})
    assert out["PredImg"].shape == (1, ps.W, ps.W, 3)
    assert float(jnp.abs(out["PredImg"]).max()) <= 1.0  # tanh output
    d = out["PredDepth"]
    assert float(d.min()) >= ps.cfg.model.min_z
    assert float(d.max()) <= ps.cfg.model.max_z


def test_identity_projection_covers_image(ps_and_vars):
    # identity camera: every pixel projects back onto the grid -> the
    # pre-dilation coverage is full, and the splatted features carry signal
    ps, vs = ps_and_vars
    batch = make_batch(1, ps.W)
    cams = {k: batch[k] for k in ("K", "Kinv", "P_in", "Pinv_in", "P_out")}
    depth, _ = ps.regress_depth(vs["unet"], batch["input_img"])
    gen_fs, bg, _ = ps.splat_view(batch["input_img"], depth, cams)
    assert float(bg.mean()) == 0.0
    assert float(jnp.abs(gen_fs).mean()) > 0.05


def test_masks_for_background_device_vs_host(ps_and_vars):
    ps, vs = ps_and_vars
    rng = np.random.default_rng(0)
    bg = jnp.asarray(rng.uniform(size=(2, ps.W, ps.W)) > 0.7)
    o1, m1, b1 = ps.masks_for_background(bg)
    o2, m2, b2 = ps.masks_for_background(bg, host=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_train_step_improves_and_updates(ps_and_vars):
    ps, vs = ps_and_vars
    state, tx_g, tx_d = create_dpr_state(ps, vs)
    step = make_dpr_train_step(ps, tx_g, tx_d)
    batch = make_batch(2, ps.W)
    rng = jax.random.PRNGKey(3)
    p0 = state.gen_vars["unet"]["params"]
    state, metrics, rng = step(state, batch, rng)
    assert np.isfinite(float(metrics["Total Loss"]))
    assert np.isfinite(float(metrics["D_total"]))
    # params actually moved
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), p0,
                     state.gen_vars["unet"]["params"]),
    )
    assert delta > 0
    state, metrics2, rng = step(state, batch, rng)
    assert np.isfinite(float(metrics2["Total Loss"]))


def test_cloud_state_append_compact():
    cs = CloudState.empty(1, 8, 2)
    pts = jnp.arange(1 * 6 * 4, dtype=jnp.float32).reshape(1, 6, 4)
    feats = jnp.ones((1, 6, 2))
    valid = jnp.array([[True, False, True, False, True, False]])
    cs2 = cs.append_compact(pts, feats, valid)
    assert int(cs2.valid.sum()) == 3
    # valid entries are compacted to the front
    assert bool(jnp.all(cs2.valid[0, :3]))
    np.testing.assert_allclose(cs2.pts[0, 0], pts[0, 0])
    np.testing.assert_allclose(cs2.pts[0, 1], pts[0, 2])
    np.testing.assert_allclose(cs2.pts[0, 2], pts[0, 4])
    # overflow: capacity 8, append 6 more valid -> keeps 8
    cs3 = cs2.append_compact(pts, feats, jnp.ones((1, 6), bool))
    assert int(cs3.valid.sum()) == 8


def test_cloud_transform_identity():
    cs = CloudState(
        pts=jnp.array([[[1.0, 2.0, 3.0, 1.0]]]),
        feats=jnp.ones((1, 1, 2)),
        valid=jnp.ones((1, 1), bool),
    )
    I = jnp.eye(4)[None]
    out = cs.transform(I, I, I)
    np.testing.assert_allclose(out.pts, cs.pts, atol=1e-6)


def test_inverse_depth_parameterization():
    """use_inverse_depth: depth = 1/(sigmoid*10 + .01) (z_buffermodel.py:310-314)."""
    cfg = tiny_config()
    cfg.model.use_inverse_depth = True
    ps = PixelSynth(cfg)
    vs = ps.init_variables(jax.random.PRNGKey(0), with_disc=False)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, ps.W, ps.W, 3)) * 2 - 1
    depth, _ = ps.regress_depth(vs["unet"], img)
    d = np.asarray(depth)
    assert d.min() >= 1.0 / 10.01 - 1e-5
    assert d.max() <= 1.0 / 0.01 + 1e-3


def test_zero_noise_eval_is_deterministic(ps_and_vars):
    """noise_scale=0.0 removes the per-forward NoiseBN redraw
    (normalization.py:21-47): different noise rngs give identical
    predictions, and no 'noise' rng is required at all."""
    ps, vs = ps_and_vars
    batch = make_batch(1, ps.W)
    cams = {k: batch[k] for k in ("K", "Kinv", "P_in", "Pinv_in", "P_out")}
    img = batch["input_img"]

    a = ps.render_no_outpaint(vs, img, cams,
                              rngs={"noise": jax.random.PRNGKey(2)},
                              noise_scale=0.0)["PredImg"]
    b = ps.render_no_outpaint(vs, img, cams,
                              rngs={"noise": jax.random.PRNGKey(99)},
                              noise_scale=0.0)["PredImg"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the zero-noise path consumes no rng stream
    c = ps.render_no_outpaint(vs, img, cams, noise_scale=0.0)["PredImg"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    # sanity: with the default per-forward redraw the outputs DO differ
    d = ps.render_no_outpaint(vs, img, cams,
                              rngs={"noise": jax.random.PRNGKey(2)})["PredImg"]
    e = ps.render_no_outpaint(vs, img, cams,
                              rngs={"noise": jax.random.PRNGKey(99)})["PredImg"]
    assert float(jnp.abs(d - e).max()) > 0
