"""Habitat (Matterport3D / Replica) data interface.

The reference renders training pairs on the fly from habitat-sim, an
external C++ simulator, behind 5 worker processes
(data/create_rgb_dataset.py:90-439, utils/custom_habitat_vector_env.py).
Rebuilding a simulator is out of scope (SURVEY.md section 2.1); the
TPU-native treatment keeps habitat as an *external host-side data source*:

  * `PreRenderedEpisodes` consumes shards exported by
    `pixelsynth_tpu/tools/export_habitat_shards.py` (run it in any
    environment with habitat installed; `--synthetic` writes fixture
    shards without a simulator) with the same sampling semantics:
    random navigable viewpoint + quaternion-jittered second view within
    max_rotation degrees;
  * `HabitatGeneratorProtocol` documents the callable interface a live
    simulator bridge must satisfy to plug into train.loop.make_batch_source.

Shard layout (one .npz per shard):
  images:  (N, 2, W, W, 3) uint8
  P:       (N, 2, 4, 4) float32   (habitat-merged, K folded like
                                    data/create_rgb_dataset.py:204-216)
  Pinv:    (N, 2, 4, 4) float32
  K, Kinv: (4, 4) float32
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Protocol

import numpy as np


class HabitatGeneratorProtocol(Protocol):
    """What a live habitat-sim bridge must provide."""

    def sample_pair(self) -> Dict[str, np.ndarray]:
        """-> {input_img, output_img (W,W,3) in [-1,1], K, Kinv,
        P_in, Pinv_in, P_out, Pinv_out (4,4)}."""
        ...


class PreRenderedEpisodes:
    """Batch source over exported habitat shards."""

    def __init__(self, shard_dir: str, seed: int = 0, split: str = None):
        """split: when given and `<split>_*.npz` shards exist, restrict to
        them (the exporter's --split naming); otherwise use every shard."""
        self.paths = sorted(glob.glob(os.path.join(shard_dir, "*.npz")))
        if split:
            split_paths = [p for p in self.paths
                           if os.path.basename(p).startswith(f"{split}_")]
            if split_paths:
                self.paths = split_paths
        if not self.paths:
            raise FileNotFoundError(f"no habitat shards in {shard_dir}")
        self.rng = np.random.default_rng(seed)
        # shard cache: items sample random shards, so a single-entry cache
        # reloads (and decompresses) a full shard per ITEM -- a ~1000x
        # input-pipeline slowdown observed in the round-3 relay run.
        # Default budget holds ~16 W=128 shards (~1.2 GB).
        self.max_cached = 16
        self._cache: Dict[str, Dict[str, np.ndarray]] = {}

    def _load(self, path: str):
        shard = self._cache.get(path)
        if shard is None:
            with np.load(path) as z:
                shard = {k: z[k] for k in z.files}
            if len(self._cache) >= self.max_cached:
                self._cache.pop(next(iter(self._cache)))
            self._cache[path] = shard
        return shard

    def sample_pair(self) -> Dict[str, np.ndarray]:
        shard = self._load(self.paths[self.rng.integers(len(self.paths))])
        i = int(self.rng.integers(shard["images"].shape[0]))
        imgs = shard["images"][i].astype(np.float32) / 255.0 * 2.0 - 1.0
        out = {
            "input_img": imgs[0],
            "output_img": imgs[1],
            "K": shard["K"].astype(np.float32),
            "Kinv": shard["Kinv"].astype(np.float32),
            "P_in": shard["P"][i, 0],
            "Pinv_in": shard["Pinv"][i, 0],
            "P_out": shard["P"][i, 1],
            "Pinv_out": shard["Pinv"][i, 1],
        }
        if "depth" in shard:
            # GT depth of the *input* view for the optional supervised-depth
            # loss (z_buffermodel.py:404-407 train_depth path)
            out["depth_img"] = shard["depth"][i, 0].astype(np.float32)
        return out

    def batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        items = [self.sample_pair() for _ in range(batch_size)]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}
