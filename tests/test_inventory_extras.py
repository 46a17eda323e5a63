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


def test_pnet_variants():
    """PNet alex/squeeze backbones (pretrained_networks.py:95-194) +
    their torchvision-layout weight loaders."""
    import numpy as np

    from pixelsynth_tpu.eval.metrics import (
        AlexNetFeatures,
        PercSim,
        SqueezeNetFeatures,
        load_torch_alexnet,
        load_torch_squeezenet,
    )

    x = jnp.zeros((1, 64, 64, 3))
    va = AlexNetFeatures().init({"params": jax.random.PRNGKey(0)}, x)
    outs = AlexNetFeatures().apply(va, x)
    assert len(outs) == 5
    assert outs[0].shape[-1] == 64 and outs[-1].shape[-1] == 256

    vs = SqueezeNetFeatures().init({"params": jax.random.PRNGKey(0)}, x)
    outs = SqueezeNetFeatures().apply(vs, x)
    assert len(outs) == 7
    assert outs[0].shape[-1] == 64 and outs[-1].shape[-1] == 512

    # PercSim runs with every backbone; identical inputs -> 0 distance
    for net in ("alex", "squeeze"):
        ps = PercSim(net=net)
        d = ps(jnp.zeros((1, 64, 64, 3)) + 0.5, jnp.zeros((1, 64, 64, 3)) + 0.5)
        assert float(jnp.abs(d).max()) < 1e-5

    # loader round-trips a torchvision-layout npz (synthetic weights)
    import tempfile, os
    rng = np.random.RandomState(0)

    def t_conv(cin, cout, k):
        return (rng.rand(cout, cin, k, k).astype(np.float32),
                rng.rand(cout).astype(np.float32))

    alex_spec = [(0, 3, 64, 11), (3, 64, 192, 5), (6, 192, 384, 3),
                 (8, 384, 256, 3), (10, 256, 256, 3)]
    raw = {}
    for idx, cin, cout, k in alex_spec:
        w, b = t_conv(cin, cout, k)
        raw[f"{idx}.weight"], raw[f"{idx}.bias"] = w, b
    with tempfile.TemporaryDirectory() as d_:
        p = os.path.join(d_, "alex.npz")
        np.savez(p, **raw)
        loaded = load_torch_alexnet(p)
        out = AlexNetFeatures().apply(loaded, x)
        assert len(out) == 5

        sq_raw = {"0.weight": t_conv(3, 64, 3)[0], "0.bias": t_conv(3, 64, 3)[1]}
        spec = {3: (64, 16, 64), 4: (128, 16, 64), 6: (128, 32, 128),
                7: (256, 32, 128), 9: (256, 48, 192), 10: (384, 48, 192),
                11: (384, 64, 256), 12: (512, 64, 256)}
        for i, (cin, s, e) in spec.items():
            for name, (ci, co, k) in (("squeeze", (cin, s, 1)),
                                      ("expand1x1", (s, e, 1)),
                                      ("expand3x3", (s, e, 3))):
                w, b = t_conv(ci, co, k)
                sq_raw[f"{i}.{name}.weight"], sq_raw[f"{i}.{name}.bias"] = w, b
        p2 = os.path.join(d_, "sq.npz")
        np.savez(p2, **sq_raw)
        loaded2 = load_torch_squeezenet(p2)
        out2 = SqueezeNetFeatures().apply(loaded2, x)
        assert len(out2) == 7
