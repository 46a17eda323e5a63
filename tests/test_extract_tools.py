"""Pipeline-glue chain test: extract dataset -> codes -> orders
(the reference's 6-step pipeline steps 1/3/5, at tiny size)."""

import os

import numpy as np
import pytest


def test_extract_chain(tmp_path):
    from pixelsynth_tpu.config import Config
    from pixelsynth_tpu.tools.extract_vqvae_dataset import extract

    cfg = Config()
    cfg.dataset = "synthetic"
    cfg.model.W = 64
    cfg.train.batch_size = 2
    out = str(tmp_path / "extraction")
    extract(cfg, out, num_train=4, num_val=2)
    assert len(os.listdir(os.path.join(out, "rgb"))) == 6
    assert os.path.exists(os.path.join(out, "cameras.pkl"))

    # the Custom dataset loads it back
    from pixelsynth_tpu.data.custom import Custom

    ds = Custom(out, W=64)
    assert len(ds) == 6
    item = ds[0]
    assert item["input_img"].shape == (64, 64, 3)
    assert item["P_in"].shape == (4, 4)

    # codes extraction (random vqvae)
    from pixelsynth_tpu.tools.extract_code import extract_codes

    cfg2 = Config()
    cfg2.model.W = 64
    cfg2.model.vqvae.channel = 16
    cfg2.model.vqvae.n_res_channel = 8
    codes_path = str(tmp_path / "codes.npy")
    extract_codes(cfg2, out, codes_path, vqvae_ckpt=None, batch=3)
    codes = np.load(codes_path)
    assert codes.shape == (6, 8, 8)
    assert codes.dtype == np.int32
    assert codes.min() >= 0 and codes.max() < 512
