"""Panorama-world fixtures: geometric exactness through the repo's own
projection math (the property that makes the end-to-end relay trainable).
"""

import numpy as np
import jax.numpy as jnp

from pixelsynth_tpu.data.panorama import (
    K_FOLD,
    camera_pose,
    make_world,
    render_view,
    sample_pair_cameras,
    synthesize_pano_shard,
)
from pixelsynth_tpu.geometry.projection import project_points


def _bilinear(img: np.ndarray, cols: np.ndarray, rows: np.ndarray) -> np.ndarray:
    H, W = img.shape[:2]
    c0 = np.clip(np.floor(cols).astype(int), 0, W - 2)
    r0 = np.clip(np.floor(rows).astype(int), 0, H - 2)
    fc = np.clip(cols - c0, 0, 1)[..., None]
    fr = np.clip(rows - r0, 0, 1)[..., None]
    top = img[r0, c0] * (1 - fc) + img[r0, c0 + 1] * fc
    bot = img[r0 + 1, c0] * (1 - fc) + img[r0 + 1, c0 + 1] * fc
    return top * (1 - fr) + bot * fr


def test_identity_roundtrip():
    """Rendering + lift at the same camera maps pixel (r, c) to itself."""
    rng = np.random.default_rng(0)
    world = make_world(rng)
    P0, _ = sample_pair_cameras(rng)
    W = 64
    img, depth = render_view(world, P0, W)
    I = np.eye(4, dtype=np.float32)[None]
    pts, valid, _ = project_points(
        jnp.asarray(depth)[None], I, I, jnp.asarray(P0)[None],
        jnp.asarray(np.linalg.inv(P0))[None], jnp.asarray(P0)[None], W=W,
    )
    pts = np.asarray(pts)[0]
    assert np.asarray(valid).all()
    grid_c = np.tile(np.arange(W), W)
    grid_r = np.repeat(np.arange(W), W)
    np.testing.assert_allclose(pts[:, 0], grid_c, atol=5e-2)
    np.testing.assert_allclose(pts[:, 1], grid_r, atol=5e-2)
    np.testing.assert_allclose(pts[:, 2], depth.reshape(-1), rtol=1e-4)


def test_cross_view_reprojection_consistency():
    """View-0 pixels lifted by GT depth land on view-1 pixels with the same
    color and depth: the world + renderer invert lift_to_cloud exactly."""
    rng = np.random.default_rng(1)
    world = make_world(rng)
    P0, P1 = sample_pair_cameras(rng, max_rotation=35.0)
    W = 96
    img0, depth0 = render_view(world, P0, W)
    img1, depth1 = render_view(world, P1, W)

    I = np.eye(4, dtype=np.float32)[None]
    pts, valid, _ = project_points(
        jnp.asarray(depth0)[None], I, I, jnp.asarray(P0)[None],
        jnp.asarray(np.linalg.inv(P0))[None], jnp.asarray(P1)[None], W=W,
    )
    pts = np.asarray(pts)[0]
    valid = np.asarray(valid)[0]
    inb = (
        valid
        & (pts[:, 0] > 1) & (pts[:, 0] < W - 2)
        & (pts[:, 1] > 1) & (pts[:, 1] < W - 2)
    )
    assert inb.sum() > 500  # substantial overlap at 35 degrees

    # color match where the reprojection lands (bilinear on view 1)
    c1 = _bilinear(img1, pts[inb, 0], pts[inb, 1])
    err = np.abs(c1 - img0.reshape(-1, 3)[inb])
    assert np.median(err) < 0.02        # texture edges excepted
    assert err.mean() < 0.06

    # view depth match (star-shaped surface from inside: no occlusion)
    d1 = _bilinear(depth1[..., None], pts[inb, 0], pts[inb, 1])[..., 0]
    rel = np.abs(d1 - pts[inb, 2]) / d1
    assert np.median(rel) < 5e-3


def test_depth_within_model_range():
    rng = np.random.default_rng(2)
    world = make_world(rng)
    for _ in range(3):
        P0, P1 = sample_pair_cameras(rng)
        _, d = render_view(world, P1, 32)
        assert d.min() > 0.8 and d.max() < 8.0  # inside [min_z, max_z]


def test_demo_convention_matches_demo_cameras():
    """camera_pose at the origin/identity equals demo.py's folded camera
    (demo_cameras with aspect ratio 1), so demo-CLI inputs are
    in-distribution for shard-trained models."""
    from pixelsynth_tpu.data.demo_data import demo_cameras

    cams = demo_cameras(1.0)
    P = camera_pose(np.zeros(3), np.zeros(3))
    np.testing.assert_allclose(P, cams["P"][0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(K_FOLD), np.diag([2, -2, -1, 1]))


def test_pano_shard_layout_and_loader():
    import os

    rng = np.random.default_rng(3)
    shard = synthesize_pano_shard(rng, 4, 32, 30.0, pairs_per_world=2)
    assert shard["images"].shape == (4, 2, 32, 32, 3)
    assert shard["depth"].shape == (4, 2, 32, 32)
    assert shard["images"].std() > 10  # actual content, not flat

    import tempfile

    from pixelsynth_tpu.data.habitat import PreRenderedEpisodes

    with tempfile.TemporaryDirectory() as d:
        np.savez(os.path.join(d, "train_00000.npz"), **shard)
        gen = PreRenderedEpisodes(d)
        batch = gen.batch(3)
        assert batch["input_img"].shape == (3, 32, 32, 3)
        assert batch["depth_img"].shape == (3, 32, 32)
        assert batch["depth_img"].dtype == np.float32
        assert np.abs(batch["input_img"]).max() <= 1.0
