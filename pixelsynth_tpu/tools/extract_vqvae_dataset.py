"""Extract a fixed image subset (+ cameras) for VQ-VAE / lmconv training.

Mirrors extract_vqvae_dataset.py:21-79: draws train+val images from the
configured dataset and writes rgb/<i>.png + cameras.pkl in the Custom
layout (data/custom.py consumes it).

Usage: python -m pixelsynth_tpu.tools.extract_vqvae_dataset \
    --out extraction/ --num-train 32000 --num-val 8000 [--dataset synthetic]
"""

from __future__ import annotations

import argparse
import os
import pickle

from pixelsynth_tpu.config import Config
from pixelsynth_tpu.eval.harness import save_png
from pixelsynth_tpu.train.loop import make_batch_source


def extract(cfg: Config, out_dir: str, num_train: int, num_val: int,
            log_every: int = 1000):
    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    cameras = []
    idx = 0
    for split, count in (("train", num_train), ("val", num_val)):
        cfg_split = cfg
        batch_fn = make_batch_source(cfg_split, split)
        while idx < (num_train if split == "train" else num_train + num_val):
            batch = batch_fn()
            B = batch["input_img"].shape[0]
            for b in range(B):
                save_png(os.path.join(out_dir, "rgb", f"{idx}.png"),
                         batch["input_img"][b])
                cameras.append([
                    {"P": batch["P_in"][b][None], "Pinv": batch["Pinv_in"][b][None],
                     "K": batch["K"][b][None], "Kinv": batch["Kinv"][b][None]},
                    {"P": batch["P_out"][b][None], "Pinv": batch["Pinv_out"][b][None],
                     "K": batch["K"][b][None], "Kinv": batch["Kinv"][b][None]},
                ])
                idx += 1
                if idx % log_every == 0:
                    print(f"extracted {idx}")
                if idx >= count + (0 if split == "train" else num_train):
                    break
    with open(os.path.join(out_dir, "cameras.pkl"), "wb") as f:
        pickle.dump(cameras, f)
    print(f"wrote {idx} images to {out_dir}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-train", type=int, default=32000)
    ap.add_argument("--num-val", type=int, default=8000)
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--data-path", default="")
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args(argv)
    cfg = Config()
    cfg.dataset = args.dataset
    cfg.train_data_path = args.data_path
    cfg.train.batch_size = args.batch_size
    extract(cfg, args.out, args.num_train, args.num_val)


if __name__ == "__main__":
    main()
