"""Eval-only depth-warp baseline.

Mirrors models/depth_model.py:12-111: predict depth, reproject the input
RGB into the output camera with the *non-differentiable z-buffer scatter*
(nearest point wins), and score against the target -- a lower bound that
isolates geometry quality from synthesis quality."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from pixelsynth_tpu.geometry.projection import (
    homogeneous_to_pixels,
    lift_to_cloud,
)
from pixelsynth_tpu.ops.depth_splat import project_zbuffer


def depth_warp_forward(ps, variables, batch: Dict) -> Dict[str, jnp.ndarray]:
    """ps: PixelSynth (for the depth regressor + config); batch: the
    standard paired-camera dict.  Returns PredImg (nearest-point warp),
    VisMask (pixels that received a point), and PredDepth."""
    img = batch["input_img"]
    B, H, W, _ = img.shape
    depth, _ = ps.regress_depth(variables["unet"], img)
    cloud = lift_to_cloud(
        depth, batch["K"], batch["Kinv"], batch["Pinv_in"], batch["P_out"], W
    )
    pts, valid = homogeneous_to_pixels(cloud, W)
    zbuf, vis = project_zbuffer(pts, W)

    # scatter the winning points' colors
    col = jnp.clip(jnp.round(pts[:, :, 0]).astype(jnp.int32), 0, W - 1)
    row = jnp.clip(jnp.round(pts[:, :, 1]).astype(jnp.int32), 0, W - 1)
    flat = row * W + col
    colors = img.reshape(B, -1, 3)

    def per_image(f, v, c):
        canvas = jnp.zeros((W * W, 3))
        # invisible points get an out-of-range index and are dropped;
        # among visible (z-buffer-winning) points last-writer-wins, which
        # reproduces the reference's scatter
        canvas = canvas.at[jnp.where(v, f, W * W)].set(c, mode="drop")
        return canvas.reshape(W, W, 3)

    pred = jax.vmap(per_image)(flat, vis & valid, colors)
    covered = (zbuf < 1e8)
    return {"PredImg": pred, "VisMask": covered, "PredDepth": depth}
