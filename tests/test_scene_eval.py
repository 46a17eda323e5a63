"""Scene generation + eval harness end-to-end at tiny size."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelsynth_tpu.config import Config
from pixelsynth_tpu.pipeline import CloudState, PixelSynth
from pixelsynth_tpu.scene import SceneGenerator, video_frame_order


def tiny_cfg(W=64):
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
    cfg.sample.num_samples = 2
    cfg.sample.num_split = 2
    return cfg


@pytest.fixture(scope="module")
def gen():
    cfg = tiny_cfg()
    ps = PixelSynth(cfg)
    vs = ps.init_variables(jax.random.PRNGKey(0))
    return SceneGenerator(ps, vs, cloud_capacity=2 * 64 * 64)


def test_generate_scene_one_direction(gen):
    W = gen.ps.W
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, W, W, 3)) * 2 - 1
    I = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    outputs = gen.generate_scene(
        img, I, I, I, I, directions=["R"], num_split=2,
        rng=jax.random.PRNGKey(2),
    )
    for key in ["PredImg_R_2", "PredImg_R_1", "PredImg_R_0"]:
        assert key in outputs, list(outputs)
        arr = outputs[key]
        assert arr.shape == (1, W, W, 3)
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() <= 1.0
    assert "PredDepthImg_R_2" in outputs
    assert "ForegroundImg_R_2" in outputs


def test_generate_view_candidates_differ(gen):
    # with a random model, different samples should differ somewhere in the
    # outpainted region after rotation
    W = gen.ps.W
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, W, W, 3)) * 2 - 1
    I = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    from pixelsynth_tpu.geometry.paths import get_rt_from_rot

    RTinv, RT = get_rt_from_rot("R", I, 2, 2)
    cams = {"K": I, "Kinv": I, "P_in": I, "Pinv_in": I, "P_out": RT}
    cloud = CloudState.empty(1, W * W, 3)
    best, out = gen.generate_view(img, cams, cloud, None, I, jax.random.PRNGKey(4))
    imgs = np.asarray(out["gen_imgs"])
    assert imgs.shape[0] == 2
    assert np.isfinite(out["d_scores"]).all()
    # bg must exist after a full rotation
    assert float(np.asarray(out["bg"]).mean()) > 0.01


def test_video_frame_order():
    frames = video_frame_order(4)
    assert frames[0] == ("R", 0)
    dirs = [d for d, _ in frames]
    assert set(dirs) <= {"R", "L", "C", "S"}
    # after the leading R_0 frame, R walks out 1..3 then back 3..0
    r_frames = [i for d, i in frames[1:9] if d == "R"]
    assert r_frames == [1, 2, 3, 3, 2, 1, 0]


def test_eval_quality_and_calc_errors(gen, tmp_path):
    from pixelsynth_tpu.eval.calc_errors import calc_errors_quality
    from pixelsynth_tpu.eval.harness import eval_quality

    W = gen.ps.W
    rng = np.random.default_rng(0)

    class FakeDS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            I = np.eye(4, dtype=np.float32)
            img = rng.uniform(-1, 1, (W, W, 3)).astype(np.float32)
            return {"input_img": img, "output_img": img,
                    "K": I, "Kinv": I, "P_in": I, "Pinv_in": I,
                    "P_out": I, "Pinv_out": I}

    out_dir = str(tmp_path / "eval")
    eval_quality(gen.ps, gen.variables, FakeDS(), out_dir, num_samples=2)
    for sub in ("input", "tgt", "pred", "fs"):
        assert len(os.listdir(os.path.join(out_dir, sub))) == 2

    def feat(batch01):
        return batch01.reshape(batch01.shape[0], -1)[:, ::512]

    m = calc_errors_quality(out_dir, feature_fn=feat)
    assert np.isfinite(m["PSNR"]) and np.isfinite(m["PercSim"])
    assert "FID" in m and np.isfinite(m["FID"])


def test_homography_identity_consistency():
    from pixelsynth_tpu.eval.homography import consistency_pair_metrics

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    mask = np.ones((64, 64), np.float32)
    # reference points on a grid, identical in both views -> identity H
    ys, xs = np.meshgrid(np.linspace(-0.9, 0.9, 8), np.linspace(-0.9, 0.9, 8),
                         indexing="ij")
    pts = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    m = consistency_pair_metrics(img, img, mask, mask, pts, pts)
    assert m["PSNR_vis"] > 40


def test_demo_save_layout(tmp_path):
    from pixelsynth_tpu.demo import save_scene, save_video_frames

    cfg = tiny_cfg()
    cfg.sample.directions = ("R", "L")
    outputs = {}
    for d in ("R", "L"):
        for i in range(0, 3):
            outputs[f"PredImg_{d}_{i}"] = np.zeros((1, 8, 8, 3), np.float32)
    save_scene(outputs, cfg, str(tmp_path))
    assert os.path.exists(tmp_path / "scene" / "output_image_R_0001.png")
    video_dir = save_video_frames(outputs, cfg, str(tmp_path))
    assert os.path.exists(os.path.join(video_dir, "0.png"))


def test_eval_quality_batched_items(gen, tmp_path):
    """Item batching through the population produces per-item outputs."""
    from pixelsynth_tpu.eval.harness import eval_quality

    W = gen.ps.W
    rng = np.random.default_rng(7)

    class FakeDS:
        def __len__(self):
            return 3  # odd size exercises tail padding

        def __getitem__(self, i):
            I = np.eye(4, dtype=np.float32)
            img = rng.uniform(-1, 1, (W, W, 3)).astype(np.float32)
            return {"input_img": img, "output_img": img,
                    "K": I, "Kinv": I, "P_in": I, "Pinv_in": I,
                    "P_out": I, "Pinv_out": I}

    out_dir = str(tmp_path / "eval_b")
    eval_quality(gen.ps, gen.variables, FakeDS(), out_dir,
                 num_samples=2, batch_size=2)
    for sub in ("input", "tgt", "pred", "fs"):
        assert sorted(os.listdir(os.path.join(out_dir, sub))) == [
            "0000.png", "0001.png", "0002.png"]


def test_eval_consistency_batched(gen, tmp_path):
    from pixelsynth_tpu.eval.harness import eval_consistency

    W = gen.ps.W
    rng = np.random.default_rng(9)

    class FakeDS:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            I = np.eye(4, dtype=np.float32)
            img = rng.uniform(-1, 1, (W, W, 3)).astype(np.float32)
            return {"input_img": img, "output_img": img,
                    "K": I, "Kinv": I, "P_in": I, "Pinv_in": I,
                    "P_out": I, "Pinv_out": I, "direction": np.int32(i % 8)}

    out_dir = str(tmp_path / "cons")
    eval_consistency(gen.ps, gen.variables, FakeDS(), out_dir,
                     num_samples=2, batch_size=2)
    from pixelsynth_tpu.geometry.paths import DIRECTION_ORDER

    for i in range(3):
        d = DIRECTION_ORDER[i % 8]
        assert os.path.exists(
            os.path.join(out_dir, f"{i:04d}", f"output_image_{d}_0001.png"))
        assert os.path.exists(
            os.path.join(out_dir, f"{i:04d}", f"output_image_{d}_0002.png"))


def test_rank_uses_entropy_and_missing_classifier_warns():
    """Re-ranking semantics (z_buffermodel.py:244-276): with equal
    discriminator scores the lowest-entropy candidate wins; building a
    generator without Places365 weights warns loudly instead of silently
    degrading to discriminator-only ranking."""
    import warnings

    import numpy as np

    from pixelsynth_tpu.sampling import rank_candidates

    d = np.array([0.0, 0.1, 0.2, 0.3])
    # zero entropy (the no-classifier degradation): ranking collapses to
    # a constant total and argmax falls to candidate 0
    assert rank_candidates(d, np.zeros(4)) == 0
    # a real entropy signal changes the winner: candidate 2 combines a
    # good discriminator rank with low entropy
    assert rank_candidates(d, np.array([0.1, 3.0, 2.0, 2.5])) == 2

    from pixelsynth_tpu.config import Config
    from pixelsynth_tpu.pipeline import PixelSynth
    from pixelsynth_tpu.scene import SceneGenerator

    cfg = Config()
    cfg.model.W = 64
    cfg.model.lmconv.obs = (3, 8, 8)
    ps = PixelSynth(cfg)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        SceneGenerator(ps, {}, num_samples=4, classifier_vars=None)
    assert any("discriminator score only" in str(w.message) for w in rec)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        SceneGenerator(ps, {}, num_samples=1, classifier_vars=None)
    assert not any("discriminator" in str(w.message) for w in rec)


def test_rank_candidates_jax_matches_numpy():
    from pixelsynth_tpu.sampling import rank_candidates, rank_candidates_jax

    rng = np.random.default_rng(7)
    for _ in range(25):
        d = rng.normal(size=6)
        e = rng.normal(size=6)
        assert int(rank_candidates_jax(jnp.asarray(d), jnp.asarray(e))) == \
            rank_candidates(d, e)


def test_covered_view_skips_population(gen):
    """A view whose background is already filled (identity output camera:
    every pixel re-splats onto itself) must take the single-decode branch:
    all candidates identical, zero scores, best = candidate 0."""
    W = gen.ps.W
    img = jax.random.uniform(jax.random.PRNGKey(5), (1, W, W, 3)) * 2 - 1
    I = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    cams = {"K": I, "Kinv": I, "P_in": I, "Pinv_in": I, "P_out": I}
    cloud = CloudState.empty(1, W * W, 3)
    best, out = gen.generate_view(img, cams, cloud, None, I,
                                  jax.random.PRNGKey(6))
    # no code cell is fully background at identity
    from pixelsynth_tpu.pipeline import downsample_mask

    bg_ds = downsample_mask(out["bg"])
    assert not bool(jnp.any(bg_ds >= 1.0 - 1e-6))
    imgs = np.asarray(out["gen_imgs"])
    np.testing.assert_array_equal(imgs[0], imgs[1])
    assert np.all(np.asarray(out["d_scores"]) == 0.0)
    np.testing.assert_array_equal(np.asarray(best)[0], imgs[0])


def test_fused_pack_cache_never_stores_tracers(gen):
    """make_sampling_logits_fn memoizes packed weights for eager callers,
    but packing under an enclosing trace (concrete variables closed over,
    traced masks) yields tracers that must NOT be cached -- regression for
    a leak where a later jit died with UnexpectedTracerError."""
    import jax

    ps = gen.ps
    if ps.cfg.model.lmconv.sample_backend != "fused":
        pytest.skip("fused backend only")
    pcnn_vars = gen.variables["pixelcnn"]
    l = ps.cfg.model.lmconv
    HW = l.obs[1] * l.obs[2]
    masks = jnp.zeros((1, 3, l.kernel_size ** 2, HW))

    ps._fused_pack_cache = None

    @jax.jit
    def traced(m):
        fn = ps.make_sampling_logits_fn(pcnn_vars, m)  # vars closed over
        codes = jnp.zeros((1, l.obs[1], l.obs[2]), jnp.int32)
        return fn(codes, jnp.ones((1, l.obs[1], l.obs[2])))

    traced(masks)
    cache = getattr(ps, "_fused_pack_cache", None)
    if cache is not None:
        leaves = jax.tree_util.tree_leaves(cache[1])
        assert not any(isinstance(x, jax.core.Tracer) for x in leaves)

    # eager call populates a concrete cache and reuses it
    ps.make_sampling_logits_fn(pcnn_vars, masks)
    c1 = ps._fused_pack_cache
    ps.make_sampling_logits_fn(pcnn_vars, masks)
    assert ps._fused_pack_cache is c1


def test_generate_view_with_classifier_entropy(gen):
    """Population path with a classifier attached: entropy is computed
    in-graph per candidate (z_buffermodel.py:254-261) and feeds ranking."""
    from pixelsynth_tpu.geometry.paths import get_rt_from_rot
    from pixelsynth_tpu.models.classifier import ResNet18
    from pixelsynth_tpu.scene import SceneGenerator

    W = gen.ps.W
    cls_vars = ResNet18(num_classes=3).init(
        {"params": jax.random.PRNGKey(9)}, jnp.zeros((1, 224, 224, 3)),
        train=False)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        gen2 = SceneGenerator(gen.ps, gen.variables, num_samples=2,
                              cloud_capacity=2 * W * W,
                              classifier_vars=cls_vars)
    img = jax.random.uniform(jax.random.PRNGKey(8), (1, W, W, 3)) * 2 - 1
    I = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    RTinv, RT = get_rt_from_rot("R", I, 2, 2)
    cams = {"K": I, "Kinv": I, "P_in": I, "Pinv_in": I, "P_out": RT}
    cloud = CloudState.empty(1, 2 * W * W, 3)
    best, out = gen2.generate_view(img, cams, cloud, None, I,
                                   jax.random.PRNGKey(10))
    e = np.asarray(out["entropy"])
    assert e.shape == (2,)
    assert np.isfinite(e).all() and (e > 0).all()
