"""Smoke tests for the stage training drivers + checkpoint resume."""

import os

import jax
import numpy as np
import pytest

from pixelsynth_tpu.config import Config


def tiny_cfg(W=64):
    cfg = Config()
    cfg.dataset = "synthetic"
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
    cfg.train.batch_size = 2
    cfg.mesh.data_parallel = 2
    return cfg


def test_run_vqvae_and_resume(tmp_path):
    from pixelsynth_tpu.train.loop import run_vqvae

    cfg = tiny_cfg()
    m1 = run_vqvae(cfg, str(tmp_path), epochs=1, iters_per_epoch=3,
                   use_mesh=True, log_fn=lambda s: None)
    assert np.isfinite(m1["mse"])
    # resume restores the checkpoint without error
    m2 = run_vqvae(cfg, str(tmp_path), epochs=2, iters_per_epoch=2,
                   use_mesh=True, log_fn=lambda s: None)
    assert np.isfinite(m2["mse"])


def test_run_lmconv(tmp_path):
    from pixelsynth_tpu.train.loop import run_lmconv

    cfg = tiny_cfg()
    m = run_lmconv(cfg, str(tmp_path), epochs=1, iters_per_epoch=3,
                   use_mesh=True, log_fn=lambda s: None)
    assert np.isfinite(m["bpd"])
    assert m["bpd"] < 12  # ~log2(512) + slack at init


def test_run_dpr_short(tmp_path):
    from pixelsynth_tpu.train.loop import run_dpr

    cfg = tiny_cfg()
    m = run_dpr(cfg, str(tmp_path), epochs=1, iters_per_epoch=2, val_iters=2,
                use_mesh=True, log_fn=lambda s: None)
    assert np.isfinite(m["Total Loss"])
    # checkpoint exists and config round-trips
    from pixelsynth_tpu.checkpoint import CheckpointManager

    ckpt = CheckpointManager(os.path.join(str(tmp_path), "dpr"))
    assert ckpt.latest_step() == 1
    cfg2 = ckpt.load_config()
    assert cfg2.model.W == cfg.model.W
    ckpt.close()
