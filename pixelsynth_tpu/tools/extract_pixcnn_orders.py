"""Extract per-image generation orders for lmconv training.

Mirrors extract_pixcnn_orders.py:29-57 (the get_gen_order model mode,
models/z_buffermodel.py:594-639): depth -> reproject -> splat -> background
mask -> greedy order, saved as an (N, rows*cols, 2) int32 .npy (the
reference pickles a python dict; an array is the same data).

Usage: python -m pixelsynth_tpu.tools.extract_pixcnn_orders \
    --dataset-folder extraction/ --out orders.npy [--ckpt-dir runs/]
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from pixelsynth_tpu.data.custom import Custom, collate
from pixelsynth_tpu.demo import load_model


def extract_orders(dataset_folder: str, out_path: str,
                   ckpt_dir: str | None = None, batch: int = 8):
    ps, variables = load_model(ckpt_dir)

    @jax.jit
    def gen_order(img, cams):
        depth, _ = ps.regress_depth(variables["unet"], img)
        fs, _ = ps.features(variables, img)
        _, bg, _ = ps.splat_view(fs, depth, cams)
        order, _, _ = ps.masks_for_background(bg)
        return order

    ds = Custom(dataset_folder, W=ps.W)
    orders = []
    for i in range(0, len(ds), batch):
        items = collate([ds[j] for j in range(i, min(i + batch, len(ds)))])
        cams = {k: items[k] for k in ("K", "Kinv", "P_in", "Pinv_in", "P_out")}
        orders.append(np.asarray(gen_order(items["input_img"], cams)))
    orders = np.concatenate(orders).astype(np.int32)
    np.save(out_path, orders)
    print(f"wrote {orders.shape} orders to {out_path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-folder", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args(argv)
    extract_orders(args.dataset_folder, args.out, args.ckpt_dir, args.batch)


if __name__ == "__main__":
    main()
