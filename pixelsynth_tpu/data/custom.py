"""Pre-extracted ("custom") datasets.

Mirrors data/custom.py: `Custom` loads the 40k-image extraction used for
VQ-VAE / lmconv training (rgb/ directory + cameras.pkl); `CustomTest` pairs
input/ and output/ directories with a per-index consistency direction
(data/consistency_directions.npy)."""

from __future__ import annotations

import os
import pickle
from typing import Dict, List

import numpy as np

from pixelsynth_tpu.data.realestate10k import _load_image


def _sorted_pngs(directory: str) -> List[str]:
    unsorted: Dict[int, str] = {}
    for root, _, fnames in sorted(os.walk(directory)):
        for fname in fnames:
            if fname.endswith(".png"):
                path = os.path.join(root, fname)
                unsorted[int(fname[:-4])] = path
    return [unsorted[k] for k in sorted(unsorted)]


def _camera_arrays(cam: Dict) -> Dict[str, np.ndarray]:
    out = {}
    for key in ("P", "Pinv", "K", "Kinv"):
        v = np.asarray(cam[key], np.float32)
        out[key] = v[0] if v.ndim == 3 else v
    return out


class Custom:
    """rgb/ + cameras.pkl extraction (data/custom.py:74-120)."""

    def __init__(self, dataset_folder: str, W: int = 256):
        with open(os.path.join(dataset_folder, "cameras.pkl"), "rb") as f:
            self.cameras = pickle.load(f)
        self.images: List[str] = []
        for root, _, fnames in sorted(os.walk(os.path.join(dataset_folder, "rgb"))):
            for fname in fnames:
                if fname.endswith(".png"):
                    self.images.append(os.path.join(root, fname))
        self.W = W

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        img = _load_image(self.images[i], self.W)
        c0 = _camera_arrays(self.cameras[i][0])
        c1 = _camera_arrays(self.cameras[i][1])
        return {
            "input_img": img, "output_img": img,
            "K": c0["K"], "Kinv": c0["Kinv"],
            "P_in": c0["P"], "Pinv_in": c0["Pinv"],
            "P_out": c1["P"], "Pinv_out": c1["Pinv"],
        }


class CustomTest:
    """input/ + output/ + cameras.pkl + consistency direction
    (data/custom.py:13-71)."""

    def __init__(self, dataset_folder: str, directions_path: str, W: int = 256):
        with open(os.path.join(dataset_folder, "cameras.pkl"), "rb") as f:
            self.cameras = pickle.load(f)
        self.directions = np.load(directions_path)
        self.inputs = _sorted_pngs(os.path.join(dataset_folder, "input"))
        self.outputs = _sorted_pngs(os.path.join(dataset_folder, "output"))
        self.W = W

    def __len__(self):
        return len(self.inputs)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        c0 = _camera_arrays(self.cameras[i][0])
        c1 = _camera_arrays(self.cameras[i][1])
        return {
            "input_img": _load_image(self.inputs[i], self.W),
            "output_img": _load_image(self.outputs[i], self.W),
            "K": c0["K"], "Kinv": c0["Kinv"],
            "P_in": c0["P"], "Pinv_in": c0["Pinv"],
            "P_out": c1["P"], "Pinv_out": c1["Pinv"],
            "direction": np.int32(self.directions[i]),
        }


def collate(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([it[k] for it in items]) for k in items[0]}
