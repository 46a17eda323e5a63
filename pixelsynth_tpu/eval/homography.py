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


def exact_rotation_homography(P1: np.ndarray, P2: np.ndarray, W: int,
                              atol: float = 1e-4) -> np.ndarray:
    """Exact pixel-space homography between two rotation-only cameras.

    The scene walk composes pure rotations onto the input camera in the
    K-folded frame (geometry/paths.py / z_buffermodel.py:202-242), so any
    two of its views with no translation delta are related by the exact
    homography  H = A @ M3 @ A^-1, where M = P2 @ P1^-1 and A maps
    homogeneous clip coords to pixel coords per
    geometry/projection.py homogeneous_to_pixels:
      col*hz = c*(hz - hx),  row*hz = c*(hz + hy),  c = (W-1)/2.
    Ground truth replaces the reference's fitted findHomography on saved
    reprojection points (calc_errors_consistency_homography.py:82-88)."""
    M = P2.astype(np.float64) @ np.linalg.inv(P1.astype(np.float64))
    if np.abs(M[:3, 3]).max() > atol:
        raise ValueError(f"cameras are not rotation-only: t={M[:3, 3]}")
    c = (W - 1) / 2.0
    A = np.array([[-c, 0.0, c], [0.0, c, c], [0.0, 0.0, 1.0]])
    H = A @ M[:3, :3] @ np.linalg.inv(A)
    return H / H[2, 2]


def consistency_exact(img1: np.ndarray, img2: np.ndarray, P1: np.ndarray,
                      P2: np.ndarray) -> Dict[str, float]:
    """Masked overlap PSNR between two [0,1] predictions of a rotation-only
    view pair, under the exact homography (both warp directions averaged,
    mirroring consistency_pair_metrics)."""
    W = img1.shape[1]
    h12 = exact_rotation_homography(P1, P2, W)
    h21 = exact_rotation_homography(P2, P1, W)
    ones = np.ones(img1.shape[:2], np.float32)
    m1 = (warp(np.stack([ones] * 3, -1), h21)[..., 0] > 0.999).astype(np.float32)
    m2 = (warp(np.stack([ones] * 3, -1), h12)[..., 0] > 0.999).astype(np.float32)
    w2in1 = warp(img2, h21)
    w1in2 = warp(img1, h12)
    a = psnr_masked((w2in1 * m1[..., None])[None],
                    (img1 * m1[..., None])[None], m1[None])
    b = psnr_masked((w1in2 * m2[..., None])[None],
                    (img2 * m2[..., None])[None], m2[None])
    return {"PSNR_vis": 0.5 * (float(a[0]) + float(b[0])),
            "overlap_frac": 0.5 * float(m1.mean() + m2.mean())}


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
