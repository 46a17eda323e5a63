"""Geometry core tests (the reference only has the inline __main__ check at
geometry/camera_transformations.py:52-83; these formalize and extend it)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelsynth_tpu.geometry import (
    euler_to_rotation_matrix,
    get_camera_matrices,
    get_deltas,
    get_rt_from_rot,
    invert_K,
    invert_RT,
    project_points,
    reproject_cloud,
)


def random_rt(rng, batch=2):
    out = []
    for _ in range(batch):
        R = np.linalg.qr(rng.standard_normal((3, 3)))[0]
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        t = rng.standard_normal(3)
        M = np.eye(4, dtype=np.float32)
        M[:3, :3] = R
        M[:3, 3] = t
        out.append(M)
    return jnp.asarray(np.stack(out))


def test_invert_rt_roundtrip():
    rng = np.random.default_rng(0)
    RT = random_rt(rng, 3)
    RTinv = invert_RT(RT)
    prod = RT @ RTinv
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5)


def test_invert_k_roundtrip():
    rng = np.random.default_rng(1)
    K = np.eye(4, dtype=np.float32)[None].repeat(2, 0)
    K[:, 0, 0] = rng.uniform(0.5, 2, 2)
    K[:, 1, 1] = rng.uniform(0.5, 2, 2)
    K[:, 0, 2] = rng.uniform(-1, 1, 2)
    K[:, 1, 2] = rng.uniform(-1, 1, 2)
    Kinv = invert_K(jnp.asarray(K))
    prod = Kinv @ K
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5)


def test_get_camera_matrices():
    rng = np.random.default_rng(2)
    R = np.linalg.qr(rng.standard_normal((3, 3)))[0]
    pos = rng.standard_normal(3)
    P, Pinv = get_camera_matrices(jnp.asarray(pos, jnp.float32), jnp.asarray(R, jnp.float32))
    np.testing.assert_allclose(P @ Pinv, np.eye(4), atol=1e-5)


def test_euler_orthonormal():
    R = euler_to_rotation_matrix(jnp.array([0.3, -0.2, 0.1]))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)


def test_get_deltas():
    I = jnp.eye(4)[None]
    ang, trans = get_deltas(I, I)
    assert float(ang[0]) == pytest.approx(0.0, abs=1e-3)
    assert float(trans[0]) == pytest.approx(0.0)
    R = euler_to_rotation_matrix(jnp.array([0.0, np.pi / 6, 0.0]))
    M = jnp.eye(4).at[:3, :3].set(R)[None]
    ang, _ = get_deltas(I, M)
    assert float(ang[0]) == pytest.approx(30.0, abs=0.1)


def test_identity_projection_maps_pixels_to_themselves():
    W = 8
    B = 1
    depth = jnp.full((B, W, W), 2.0)
    I = jnp.eye(4)[None]
    pts, valid, _ = project_points(depth, I, I, I, I, I, I, W=W)
    cols = np.arange(W)
    rows = np.arange(W)
    exp_c = np.tile(cols, W)
    exp_r = np.repeat(rows, W)
    np.testing.assert_allclose(pts[0, :, 0], exp_c, atol=1e-4)
    np.testing.assert_allclose(pts[0, :, 1], exp_r, atol=1e-4)
    np.testing.assert_allclose(pts[0, :, 2], 2.0, atol=1e-5)
    assert bool(jnp.all(valid))


def test_translation_shifts_depth():
    # habitat convention: camera looks down -z, so a point at depth 3 sits at
    # camera z=-3.  RT2 = [I | +1z] places camera 2 at world z=-1 (still
    # looking down -z), leaving the point 2 units in front of it.
    W = 4
    depth = jnp.full((1, W, W), 3.0)
    I = jnp.eye(4)[None]
    T = jnp.eye(4).at[2, 3].set(1.0)[None]
    pts, valid, _ = project_points(depth, I, I, I, I, T, invert_RT(T), W=W)
    np.testing.assert_allclose(pts[0, :, 2], 2.0, atol=1e-4)


def test_cumulative_cloud_roundtrip():
    # carrying a cloud and reprojecting it into the same camera reproduces
    # the direct projection
    W = 8
    rng = np.random.default_rng(3)
    depth = jnp.asarray(rng.uniform(1, 5, (1, W, W)), jnp.float32)
    I = jnp.eye(4)[None]
    R = euler_to_rotation_matrix(jnp.array([0.0, 0.2, 0.0]))
    M = jnp.eye(4).at[:3, :3].set(R)[None]
    pts, valid, cloud = project_points(depth, I, I, I, I, M, invert_RT(M), W=W)
    pts2, valid2 = reproject_cloud(cloud, I, M, invert_RT(M), W)
    np.testing.assert_allclose(pts, pts2, atol=1e-4)


def test_get_rt_from_rot_paths():
    I = jnp.eye(4)[None]
    for direction in ["R", "L", "U", "D", "UL", "UR", "DR", "DL"]:
        RTinv, RT = get_rt_from_rot(direction, I, 16, 32)
        np.testing.assert_allclose(RT @ RTinv, np.broadcast_to(np.eye(4), (1, 4, 4)), atol=1e-5)
    # swirl keeps rotation, changes translation
    RTinv, RT = get_rt_from_rot("S", I, 3, 64)
    np.testing.assert_allclose(RT[0, :3, :3], np.eye(3), atol=1e-5)
    assert float(jnp.abs(RT[0, :3, 3]).sum()) > 0.1
    # circle rotates
    RTinv, RT = get_rt_from_rot("C", I, 3, 64)
    assert float(jnp.abs(RT[0, :3, :3] - jnp.eye(3)).sum()) > 1e-3
    # num=0 for R/L gives identity rotation
    RTinv, RT = get_rt_from_rot("R", I, 0, 32)
    np.testing.assert_allclose(RT[0], np.eye(4), atol=1e-6)


def test_get_rt_from_rot_exact_inverse_merged_K():
    """The returned inverse must be EXACT for non-orthonormal extrinsics.

    Demo/habitat cameras fold OFFSET @ K into P (demo.py:36-39), so
    P[:3,:3] = diag(2,-2,-1) is not a rotation.  The reference inverts with
    torch.inverse (z_buffermodel.py:215,224,241); the orthonormal-transpose
    shortcut is wrong by diag(4,4,1) here, and in a cumulative walk that
    error compounds per hop -- the round-5 scene-drift root cause (the
    carried cloud collapsed 16384 -> 1024 -> 64 -> 4 on-screen points)."""
    from pixelsynth_tpu.data.demo_data import demo_cameras

    P = jnp.asarray(demo_cameras(1.0)["P"])  # (1, 4, 4), det 4
    for direction in ["R", "L", "U", "S", "C"]:
        RTinv, RT = get_rt_from_rot(direction, P, 3, 8)
        np.testing.assert_allclose(
            np.asarray(RT @ RTinv), np.broadcast_to(np.eye(4), (1, 4, 4)),
            atol=1e-5)
