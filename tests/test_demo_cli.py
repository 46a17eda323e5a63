"""Demo CLI smoke test (reference demo.py surface) + consistency-fixtures
layout test against the homography metric's consumption conventions."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from pixelsynth_tpu.config import Config


def _tiny_cfg(W=32):
    from tests.test_train_loops import tiny_cfg

    cfg = tiny_cfg(W=W)
    cfg.sample.num_split = 2
    cfg.sample.num_samples = 1
    return cfg


def _save_tiny_ckpt(workdir, cfg):
    from pixelsynth_tpu.checkpoint import CheckpointManager
    from pixelsynth_tpu.pipeline import PixelSynth
    from pixelsynth_tpu.train.dpr import create_dpr_state

    ps = PixelSynth(cfg)
    variables = ps.init_variables(jax.random.PRNGKey(0))
    state, _, _ = create_dpr_state(ps, variables)
    mgr = CheckpointManager(os.path.join(workdir, "dpr"))
    mgr.save(1, jax.device_get(state), cfg, {"psnr": 0.0})
    mgr.close()
    return ps, variables


def test_demo_cli_gen_img(tmp_path):
    from PIL import Image

    from pixelsynth_tpu.demo import main

    cfg = _tiny_cfg()
    _save_tiny_ckpt(str(tmp_path), cfg)
    img_path = os.path.join(str(tmp_path), "in.png")
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(img_path)
    out_dir = os.path.join(str(tmp_path), "out")

    main(["--img", img_path, "--mode", "gen_img", "--ckpt-dir", str(tmp_path),
          "--result-folder", out_dir, "--direction", "R"])

    out = np.asarray(Image.open(os.path.join(out_dir, "output_image_R_0.png")))
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out.astype(np.float64)).all()
    assert os.path.exists(os.path.join(out_dir, "input_fs_image_R_0.png"))


def test_consistency_fixtures_feed_homography(tmp_path):
    """make_fixtures_for_item output plugs directly into
    consistency_pair_metrics (mask/point layout conventions agree)."""
    from pixelsynth_tpu.eval.consistency_fixtures import make_fixtures_for_item
    from pixelsynth_tpu.eval.homography import consistency_pair_metrics
    from pixelsynth_tpu.pipeline import PixelSynth

    cfg = _tiny_cfg()
    ps = PixelSynth(cfg)
    variables = ps.init_variables(jax.random.PRNGKey(0), with_disc=False)
    W = cfg.model.W
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.uniform(-1, 1, (1, W, W, 3)).astype(np.float32))
    I = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))

    fx = make_fixtures_for_item(ps, variables, img, I, I, I, I, "R", grid=8)
    assert fx["mask1"].shape == (W, W) and fx["mask1"].dtype == np.uint8
    assert fx["pts1"].shape == (64, 2)
    assert np.isfinite(fx["pts1"]).all()
    # clipped reference-point convention: [-1, 1]-ish coords
    assert np.abs(fx["pts1"]).max() < 10

    # the model-produced fixtures plug straight into the metric
    img1 = rng.rand(W, W, 3).astype(np.float32)
    img2 = np.clip(img1 + rng.randn(W, W, 3).astype(np.float32) * 0.05, 0, 1)
    m = consistency_pair_metrics(
        img1, img2, fx["mask1"], fx["mask2"], fx["pts1"], fx["pts2"])
    assert np.isfinite(m["PSNR_vis"])

    # controlled geometry: identical points -> identity homography ->
    # identical images score (near-)perfect masked PSNR
    gy, gx = np.mgrid[0:8, 0:8].astype(np.float32)
    pts_id = np.stack([gx.reshape(-1) / 7 * 2 - 1, gy.reshape(-1) / 7 * 2 - 1], -1)
    ones = np.ones((W, W), np.uint8)
    m_id = consistency_pair_metrics(img1, img1, ones, ones, pts_id, pts_id)
    assert m_id["PSNR_vis"] > 40
