"""Generate consistency-eval fixtures (visibility masks + reference
reprojection points).

The reference evaluates view consistency against author-shipped fixtures:
data/consistency_masks/<i>/mask{1,2}.png and
data/consistency_reference_points/reproj{1,2}_<i>.npy
(calc_errors_consistency_homography.py:55-88).  This tool produces the
same artifacts from the model itself: lift a sparse grid of input-view
pixels by the predicted depth, project them into the full- and
half-rotation cameras (the reference points, stored in [-1,1] coords with
the reference's x convention), and rasterize the full input cloud into
each view's z-buffer for the visibility masks."""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from pixelsynth_tpu.eval.harness import save_png
from pixelsynth_tpu.geometry.paths import get_rt_from_rot
from pixelsynth_tpu.geometry.projection import lift_to_cloud, homogeneous_to_pixels
from pixelsynth_tpu.ops.depth_splat import project_zbuffer


def _pixels_to_ref_coords(pts: jnp.ndarray, W: int) -> np.ndarray:
    """(N, 3) pixel coords -> the reference's stored convention: [-1,1]
    with x flipped back (the metric rescales via (p*.5+.5)*255 and flips x,
    calc_errors_consistency_homography.py:84-88)."""
    col = np.asarray(pts[:, 0])
    row = np.asarray(pts[:, 1])
    x = 1.0 - 2.0 * col / (W - 1)   # stored x: flipped
    y = 2.0 * row / (W - 1) - 1.0
    return np.stack([x, y], -1).astype(np.float32)


def make_fixtures_for_item(
    ps,
    variables: Dict,
    img: jnp.ndarray,
    K, Kinv, P_in, Pinv_in,
    direction: str,
    *,
    grid: int = 16,
):
    """-> dict(mask1, mask2 (W, W) uint8, pts1, pts2 (grid^2, 2) float32)
    for the (full, half) rotation pair of `direction`."""
    W = ps.W
    depth, _ = ps.regress_depth(variables["unet"], img)

    masks, pts = [], []
    for numerator in (2, 1):
        _, RT = get_rt_from_rot(direction, P_in, numerator, 2)
        cloud = lift_to_cloud(depth, K, Kinv, Pinv_in, RT, W)
        p, valid = homogeneous_to_pixels(cloud, W)
        zbuf, vis = project_zbuffer(p, W)
        masks.append(np.asarray((zbuf < 1e8)[0]).astype(np.uint8))
        # sparse reference grid: every (W//grid)-th input pixel's projection
        stride = W // grid
        sel = (np.arange(0, W, stride)[:, None] * W
               + np.arange(0, W, stride)[None, :]).reshape(-1)
        pts.append(_pixels_to_ref_coords(p[0, sel], W))
    return {"mask1": masks[0], "mask2": masks[1],
            "pts1": pts[0], "pts2": pts[1]}


def write_fixtures(
    ps, variables, dataset, out_dir: str, *, limit=None, grid: int = 16
):
    """Write the reference's fixture layout for every dataset item."""
    from pixelsynth_tpu.geometry.paths import DIRECTION_ORDER

    masks_dir = os.path.join(out_dir, "consistency_masks")
    pts_dir = os.path.join(out_dir, "consistency_reference_points")
    os.makedirs(pts_dir, exist_ok=True)
    n = len(dataset) if limit is None else min(limit, len(dataset))
    for i in range(n):
        item = dataset[i]
        d = DIRECTION_ORDER[int(item["direction"])]
        fx = make_fixtures_for_item(
            ps, variables,
            jnp.asarray(item["input_img"])[None],
            jnp.asarray(item["K"])[None], jnp.asarray(item["Kinv"])[None],
            jnp.asarray(item["P_in"])[None], jnp.asarray(item["Pinv_in"])[None],
            d, grid=grid,
        )
        idir = os.path.join(masks_dir, f"{i:04d}")
        save_png(os.path.join(idir, "mask1.png"),
                 np.repeat(fx["mask1"][..., None], 3, -1).astype(np.float32))
        save_png(os.path.join(idir, "mask2.png"),
                 np.repeat(fx["mask2"][..., None], 3, -1).astype(np.float32))
        np.save(os.path.join(pts_dir, f"reproj1_{i}.npy"), fx["pts1"])
        np.save(os.path.join(pts_dir, f"reproj2_{i}.npy"), fx["pts2"])
