"""Homography-based view-consistency metric.

Mirrors calc_errors_consistency_homography.py:41-105: given two predictions
of the same scene content (full and half rotation of a direction), fit a
homography through saved reference reprojection points, warp each image
into the other's frame, and score masked PSNR_vis / PercSim_vis on the
overlap; the two warp directions are averaged."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from pixelsynth_tpu.eval.metrics import PercSim, psnr_masked


def homography_from_points(pts_src: np.ndarray, pts_dst: np.ndarray):
    """cv2.findHomography on (N, >=2) reference point arrays stored in
    [-1,1] coords (the reference rescales and x-flips them,
    calc_errors_consistency_homography.py:84-88)."""
    import cv2

    src = (pts_src * 0.5 + 0.5) * 255
    dst = (pts_dst * 0.5 + 0.5) * 255
    src[:, 0] = 255 - src[:, 0]
    dst[:, 0] = 255 - dst[:, 0]
    h, _ = cv2.findHomography(src[:, :2], dst[:, :2])
    return h


def warp(img01: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Warp an (H, W, 3) [0,1] image by homography h."""
    import cv2

    out = cv2.warpPerspective((img01 * 255).astype(np.float32), h,
                              (img01.shape[1], img01.shape[0]))
    return out / 255.0


def consistency_pair_metrics(
    img1: np.ndarray,
    img2: np.ndarray,
    mask1: np.ndarray,
    mask2: np.ndarray,
    pts1: np.ndarray,
    pts2: np.ndarray,
    percsim: Optional[PercSim] = None,
) -> Dict[str, float]:
    """img1/img2: (H, W, 3) [0,1]; mask1/mask2: (H, W) {0,1}; pts: (N, >=2)
    reference reprojection points of each view.  Returns averaged
    PSNR_vis / PercSim_vis over both warp directions."""
    h12 = homography_from_points(pts1, pts2)
    h21 = homography_from_points(pts2, pts1)
    w2in1 = warp(img2, h21)   # view 2 warped into view 1's frame
    w1in2 = warp(img1, h12)

    m1 = mask1[..., None]
    m2 = mask2[..., None]
    a = psnr_masked((w2in1 * m1)[None], (img1 * m1)[None], mask1[None])
    b = psnr_masked((w1in2 * m2)[None], (img2 * m2)[None], mask2[None])
    out = {"PSNR_vis": 0.5 * (float(a[0]) + float(b[0]))}
    if percsim is not None:
        pa = float(percsim((w2in1 * m1)[None], (img1 * m1)[None])[0])
        pb = float(percsim((w1in2 * m2)[None], (img2 * m2)[None])[0])
        out["PercSim_vis"] = 0.5 * (pa + pb)
    return out
