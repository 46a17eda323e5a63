"""Non-differentiable z-sorted depth splat (eval only).

Mirrors models/projection/depth_manipulator.py:37-104 (project_zbuffer):
brute-force nearest-point-per-pixel scatter used to compute
visible/invisible masks for the consistency evaluation -- here a
scatter-min over rounded pixel coordinates."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

BIG = 1e9


def project_zbuffer(points: jnp.ndarray, W: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """points: (B, N, 3) as (col, row, depth) pixel coords.

    Returns (depth_map (B, W, W) with +inf-like BIG where empty,
             visible (B, N) bool -- point wins its pixel's z-buffer)."""
    B, N, _ = points.shape
    col = jnp.round(points[:, :, 0]).astype(jnp.int32)
    row = jnp.round(points[:, :, 1]).astype(jnp.int32)
    depth = points[:, :, 2]
    ok = (col >= 0) & (col < W) & (row >= 0) & (row < W) & (depth > 0)
    flat = jnp.clip(row * W + col, 0, W * W - 1)
    d = jnp.where(ok, depth, BIG)

    def per_image(f, dd):
        zbuf = jnp.full((W * W,), BIG).at[f].min(dd)
        vis = dd <= zbuf[f] + 1e-6
        return zbuf.reshape(W, W), vis

    zbuf, vis = jax.vmap(per_image)(flat, d)
    return zbuf, vis & ok


def visibility_masks(points_v1: jnp.ndarray, points_v2: jnp.ndarray, W: int):
    """Per-pixel visibility masks of view-1 content in view 2 (the
    consistency_masks the homography metric consumes): a view-1 pixel is
    'visible' in view 2 if its reprojected point wins the view-2 z-buffer."""
    _, vis = project_zbuffer(points_v2, W)
    B = points_v1.shape[0]
    return vis.reshape(B, W, W)
