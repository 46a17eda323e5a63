"""Tests for the long-tail inventory: hilbert order, arch tables,
depth-warp baseline, nerf circle path, consistency calc driver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelsynth_tpu.ops.orders import generation_order, hilbert_order


def test_hilbert_order_valid():
    o = hilbert_order(8, 8)
    assert o.shape == (64, 2)
    assert len(set(map(tuple, o.tolist()))) == 64
    # consecutive cells are 4-neighbors (defining property of the curve)
    for a, b in zip(o[:-1], o[1:]):
        assert abs(int(a[0]) - int(b[0])) + abs(int(a[1]) - int(b[1])) == 1


def test_generation_order_variants():
    for name in ("raster_scan", "s_curve", "hilbert",
                  "s_curve_center_quarter_last"):
        o = generation_order(name, 8, 8)
        assert len(set(map(tuple, np.asarray(o).tolist()))) == 64
    # center-quarter-last: the 4x4 center block occupies the tail
    o = generation_order("s_curve_center_quarter_last", 8, 8)
    tail = set(map(tuple, o[-16:].tolist()))
    assert tail == {(r, c) for r in range(2, 6) for c in range(2, 6)}


def test_arch_tables():
    from pixelsynth_tpu.models.encoderdecoder import get_resnet_arch

    for name in ("resnet_256W8UpDown", "resnet_256W8UpDownRGB",
                 "resnet_256W8UpDown3", "resnet_256W8UpDown3SuperRes",
                 "resnet_256W8UpDown3_ultra", "resnet_256W8"):
        arch = get_resnet_arch(name, 16)
        assert len(arch["layers_enc"]) == 9
        assert len(arch["layers_dec"]) == 9
        assert len(arch["upsample"]) == 8
        # encoder+decoder round trip preserves resolution
        downs = sum(1 for u in arch["upsample"] if u == "Down")
        downs += sum(1 for d in arch["downsample"] if d)
        ups = sum(1 for u in arch["upsample"] if u in ("Up", True))
        assert downs == ups, name


def test_depth_warp_baseline():
    from pixelsynth_tpu.config import Config
    from pixelsynth_tpu.models.depth_model import depth_warp_forward
    from pixelsynth_tpu.pipeline import PixelSynth

    cfg = Config()
    cfg.model.W = 64
    cfg.model.unet_num_filters = 4
    cfg.model.ngf = 8
    cfg.model.lmconv.obs = (3, 8, 8)
    ps = PixelSynth(cfg)
    vs = ps.init_variables(jax.random.PRNGKey(0), with_disc=False)
    B, W = 1, 64
    img = jax.random.uniform(jax.random.PRNGKey(1), (B, W, W, 3)) * 2 - 1
    I = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    batch = {"input_img": img, "K": I, "Kinv": I, "P_in": I, "Pinv_in": I,
             "P_out": I}
    out = depth_warp_forward(ps, vs, batch)
    # identity camera: the warp reproduces the input exactly
    np.testing.assert_allclose(np.asarray(out["PredImg"]), np.asarray(img),
                               atol=1e-5)
    assert bool(jnp.all(out["VisMask"]))


def test_nerf_circle_path():
    from pixelsynth_tpu.utils.camera_paths import nerf_like_circle

    rts = nerf_like_circle(8)
    assert len(rts) == 8
    for M in rts:
        np.testing.assert_allclose(M[:3, :3], np.eye(3))
    assert np.abs(np.stack(rts)[:, :3, 3]).max() > 0.1


def test_inception_features():
    from pixelsynth_tpu.eval.inception import (
        InceptionV3Features,
        make_fid_feature_fn,
    )

    net = InceptionV3Features()
    x = jnp.zeros((1, 299, 299, 3))
    vs = net.init({"params": jax.random.PRNGKey(0)}, x)
    out = net.apply(vs, x)
    assert out.shape == (1, 2048)
    # parameter count matches the torchvision inception_v3 conv stack
    n = sum(p.size for p in jax.tree.leaves(vs["params"]))
    assert abs(n - 21_789_000) < 20_000, n
    fn = make_fid_feature_fn(vs)
    assert fn(jnp.zeros((2, 32, 32, 3))).shape == (2, 2048)
