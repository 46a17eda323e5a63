"""Evaluation harnesses: paired-image quality and two-view consistency.

Mirrors evaluation/eval_quality.py (gen_paired_img over the fixed test set,
saving input/target/prediction/feature PNGs, 112-154) and
evaluation/eval_consistency.py (gen_two_imgs: full + half rotation renders
per fixed consistency direction, 101-149).  The offline metric battery
(calc_errors) then runs over the saved folders."""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from pixelsynth_tpu.geometry.paths import DIRECTION_ORDER
from pixelsynth_tpu.pipeline import CloudState, PixelSynth
from pixelsynth_tpu.scene import SceneGenerator


def save_png(path: str, img: np.ndarray):
    """img: (H, W, 3) in [-1, 1] or [0, 1]."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.min() < -0.01:
        arr = arr * 0.5 + 0.5
    arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def eval_quality(
    ps: PixelSynth,
    variables: Dict,
    dataset,
    out_dir: str,
    *,
    num_samples: int = 1,
    temperature: float = 0.5,
    limit: Optional[int] = None,
    start: int = 0,
    batch_size: int = 1,
    rng: Optional[jax.Array] = None,
) -> None:
    """gen_paired_img over a paired dataset; saves input/ tgt/ pred/ fs/
    PNG folders (eval_quality.py:112-154).

    `start`/`limit` give the index-range sharding the reference docs
    recommend doing manually across GPUs (docs/REALESTATE.md:74).
    `batch_size` batches ITEMS through the sampling population (item-major
    B x num_samples candidates in one loop) -- the reference evaluates one
    image at a time; on TPU batching items amortizes the AR loop across
    the whole eval set."""
    gen = SceneGenerator(ps, variables, num_samples=num_samples,
                         temperature=temperature,
                         cloud_capacity=ps.W * ps.W)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n = len(dataset) if limit is None else min(start + limit, len(dataset))
    for i0 in range(start, n, batch_size):
        idxs = list(range(i0, min(i0 + batch_size, n)))
        # keep shapes static: pad the tail batch by repeating the last item
        padded = idxs + [idxs[-1]] * (batch_size - len(idxs))
        items = [dataset[j] for j in padded]
        batch = {k: np.stack([np.asarray(it[k]) for it in items])
                 for k in items[0] if k != "direction"}
        cams = {"K": batch["K"], "Kinv": batch["Kinv"],
                "P_in": batch["P_in"], "Pinv_in": batch["Pinv_in"],
                "P_out": batch["P_out"]}
        cloud = CloudState.empty(batch_size, ps.W * ps.W, 3)
        rng, sub = jax.random.split(rng)
        best_img, out = gen.generate_view(
            batch["input_img"], cams, cloud, None, batch["Pinv_in"], sub
        )
        best_np = np.asarray(best_img)
        fs_np = np.asarray(out["gen_fs"])
        for b, i in enumerate(idxs):
            save_png(os.path.join(out_dir, "input", f"{i:04d}.png"),
                     batch["input_img"][b])
            save_png(os.path.join(out_dir, "tgt", f"{i:04d}.png"),
                     batch["output_img"][b])
            save_png(os.path.join(out_dir, "pred", f"{i:04d}.png"), best_np[b])
            save_png(os.path.join(out_dir, "fs", f"{i:04d}.png"), fs_np[b])


def eval_consistency(
    ps: PixelSynth,
    variables: Dict,
    dataset,
    out_dir: str,
    *,
    num_samples: int = 1,
    temperature: float = 0.5,
    limit: Optional[int] = None,
    start: int = 0,
    batch_size: int = 1,
    rng: Optional[jax.Array] = None,
) -> None:
    """gen_two_imgs per item: full + half rotation of the item's fixed
    consistency direction, saved as output_image_<dir>_0001/0002.png
    (eval_consistency.py:101-149).  Items batch through the sampling
    population with per-item directions (the reference loops items)."""
    from pixelsynth_tpu.scene import TwoImageGenerator

    gen = TwoImageGenerator(ps, variables, num_samples=num_samples,
                            temperature=temperature,
                            cloud_capacity=2 * ps.W * ps.W)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n = len(dataset) if limit is None else min(start + limit, len(dataset))
    for i0 in range(start, n, batch_size):
        idxs = list(range(i0, min(i0 + batch_size, n)))
        padded = idxs + [idxs[-1]] * (batch_size - len(idxs))
        items = [dataset[j] for j in padded]
        directions = [DIRECTION_ORDER[int(it["direction"])] for it in items]
        batch = {k: np.stack([np.asarray(it[k]) for it in items])
                 for k in items[0] if k != "direction"}
        rng, sub = jax.random.split(rng)
        outputs = gen.generate_two_imgs(
            batch["input_img"], batch["K"], batch["Kinv"],
            batch["P_in"], batch["Pinv_in"], directions, rng=sub,
        )
        for b, i in enumerate(idxs):
            d = directions[b]
            img_dir = os.path.join(out_dir, f"{i:04d}")
            save_png(os.path.join(img_dir, f"output_image_{d}_0002.png"),
                     outputs["PredImg_2"][b])
            save_png(os.path.join(img_dir, f"output_image_{d}_0001.png"),
                     outputs["PredImg_1"][b])
