"""Offline consistency metric driver.

Mirrors calc_errors_consistency_homography.py: walk the eval_consistency
output folders, load the two predictions + visibility masks + reference
reprojection points per item, and average the homography-warped masked
PSNR_vis / PercSim_vis."""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional

import numpy as np

from pixelsynth_tpu.eval.homography import consistency_pair_metrics
from pixelsynth_tpu.eval.metrics import PercSim
from pixelsynth_tpu.geometry.paths import DIRECTION_ORDER


def _load01(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def _load_mask(path, shape):
    from PIL import Image

    if os.path.exists(path):
        m = np.asarray(Image.open(path).convert("L"), np.float32) / 255.0
        return (m > 0.5).astype(np.float32)
    return np.ones(shape, np.float32)


def calc_errors_consistency(
    pred_dir: str,
    directions: np.ndarray,
    *,
    masks_dir: Optional[str] = None,
    points_dir: Optional[str] = None,
    limit: Optional[int] = None,
) -> Dict[str, float]:
    """pred_dir: eval_consistency output (one %04d folder per item with
    output_image_<dir>_0001/0002.png).  masks_dir/points_dir: the
    reference's consistency_masks and consistency_reference_points layouts
    (optional; identity points + full masks otherwise -- smoke mode)."""
    percsim = PercSim()
    results = {"PSNR_vis": [], "PercSim_vis": []}
    items = sorted(d for d in os.listdir(pred_dir)
                   if os.path.isdir(os.path.join(pred_dir, d)))
    if limit:
        items = items[:limit]
    for name in items:
        i = int(name)
        direction = DIRECTION_ORDER[int(directions[i])]
        folder = os.path.join(pred_dir, name)
        img1 = _load01(os.path.join(folder, f"output_image_{direction}_0001.png"))
        img2 = _load01(os.path.join(folder, f"output_image_{direction}_0002.png"))
        H = img1.shape[0]
        m1 = _load_mask(os.path.join(masks_dir or "", name, "mask1.png"),
                        (H, H)) if masks_dir else np.ones((H, H), np.float32)
        m2 = _load_mask(os.path.join(masks_dir or "", name, "mask2.png"),
                        (H, H)) if masks_dir else np.ones((H, H), np.float32)
        if points_dir:
            pts1 = np.load(os.path.join(points_dir, f"reproj1_{i}.npy"))
            pts2 = np.load(os.path.join(points_dir, f"reproj2_{i}.npy"))
        else:
            ys, xs = np.meshgrid(np.linspace(-0.9, 0.9, 8),
                                 np.linspace(-0.9, 0.9, 8), indexing="ij")
            pts1 = pts2 = np.stack([xs.ravel(), ys.ravel()], -1)
        m = consistency_pair_metrics(img1, img2, m1, m2, pts1, pts2, percsim)
        for k, v in m.items():
            results[k].append(v)
    return {k: float(np.mean(v)) for k, v in results.items() if v}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pred_dir")
    ap.add_argument("--directions", required=True,
                    help=".npy of per-item consistency directions")
    ap.add_argument("--masks-dir", default=None)
    ap.add_argument("--points-dir", default=None)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()
    dirs = np.load(args.directions)
    print(json.dumps(calc_errors_consistency(
        args.pred_dir, dirs, masks_dir=args.masks_dir,
        points_dir=args.points_dir, limit=args.limit), indent=2))


if __name__ == "__main__":
    main()
