"""Offline metric battery over saved prediction folders.

Mirrors calc_errors_quality.py + utils/calc_errors.py:104-284: PSNR
(clamped), SSIM, PercSim over tgt/ vs pred/ folders, FID over activation
statistics, and the tail rates.  Run after eval_quality."""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from pixelsynth_tpu.eval.metrics import (
    PercSim,
    feature_stats,
    fid_from_stats,
    psnr_clamped,
    ssim_metric,
    tail_rates,
)


def _load01(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def _folder(dirname: str) -> List[str]:
    return sorted(
        os.path.join(dirname, f) for f in os.listdir(dirname)
        if f.endswith(".png")
    )


def calc_errors_quality(
    out_dir: str,
    *,
    percsim: Optional[PercSim] = None,
    feature_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    batch: int = 16,
    limit: Optional[int] = None,
) -> Dict[str, float]:
    """tgt/ vs pred/ under out_dir -> metric dict.

    feature_fn: (B, H, W, 3) [0,1] -> (B, D) activations for FID (ported
    InceptionV3 pool3 for parity; any embedding for smoke)."""
    tgt_paths = _folder(os.path.join(out_dir, "tgt"))
    pred_paths = _folder(os.path.join(out_dir, "pred"))
    if limit:
        tgt_paths, pred_paths = tgt_paths[:limit], pred_paths[:limit]
    percsim = percsim or PercSim()

    psnrs, ssims, percs = [], [], []
    feats_t, feats_p = [], []
    for i in range(0, len(tgt_paths), batch):
        tgt = np.stack([_load01(p) for p in tgt_paths[i: i + batch]])
        pred = np.stack([_load01(p) for p in pred_paths[i: i + batch]])
        psnrs.append(np.asarray(psnr_clamped(jnp.asarray(pred), jnp.asarray(tgt))))
        ssims.append(float(ssim_metric(jnp.asarray(pred), jnp.asarray(tgt))))
        percs.append(np.asarray(percsim(pred, tgt)))
        if feature_fn is not None:
            feats_t.append(np.asarray(feature_fn(tgt)))
            feats_p.append(np.asarray(feature_fn(pred)))

    psnrs = np.concatenate(psnrs)
    percs = np.concatenate(percs)
    out = {
        "PSNR": float(psnrs.mean()),
        "SSIM": float(np.mean(ssims)),
        "PercSim": float(percs.mean()),
    }
    out.update(tail_rates(psnrs, percs, np.repeat(np.asarray(ssims), batch)[: len(psnrs)]))
    if feature_fn is not None:
        mu1, s1 = feature_stats(np.concatenate(feats_t))
        mu2, s2 = feature_stats(np.concatenate(feats_p))
        out["FID"] = fid_from_stats(mu1, s1, mu2, s2)
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()
    print(json.dumps(calc_errors_quality(args.out_dir, limit=args.limit),
                     indent=2))


if __name__ == "__main__":
    main()
