"""RealEstate10K dataset (host-side, numpy/PIL -- no torch).

Mirrors data/realestate10k.py:
  * per-video metadata txt (header row skipped) with columns
    [timestamp, fx fy cx cy k1 k2, 12 extrinsic entries];
  * habitat-style camera merge: P = (offset @ K_frame) @ [R|t] promoted to
    4x4, model-facing K = identity (realestate10k.py:59-77, 123-140);
  * training pair sampler with rejection: candidate second frames must
    satisfy angle in (max_rotation/2, 60) deg and translation < 1, and at
    least 6 candidates must exist before a video is accepted
    (realestate10k.py:154-216);
  * `RealEstate10KFixed`: replays the 3600 fixed test triples from
    realestate_test_indices.npy (realestate10k.py:313-430);
  * totrain/toval re-split by the 80/20 video prefix (realestate10k.py:298-310).

Images are returned NHWC float32 in [-1,1]; batches are flat dicts matching
the pipeline's camera keys.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

OFFSET = np.array([[2, 0, -1], [0, -2, 1], [0, 0, -1]], np.float32)
IDENTITY4 = np.eye(4, dtype=np.float32)


def habitat_merge_camera(intrinsics: np.ndarray, extrinsics: np.ndarray):
    """(fx fy cx cy ...), (12,) row-major [R|t] -> (P, Pinv) 4x4 with the
    frame intrinsics folded into P (model-facing K is identity)."""
    origK = np.array(
        [[intrinsics[0], 0, intrinsics[2]],
         [0, intrinsics[1], intrinsics[3]],
         [0, 0, 1]], np.float32,
    )
    K = OFFSET @ origK
    origP = extrinsics.reshape(3, 4).astype(np.float32)
    P = np.vstack([K @ origP, np.zeros((1, 4), np.float32)])
    P[3, 3] = 1
    return P.astype(np.float32), np.linalg.inv(P).astype(np.float32)


def _angle_trans(ex1: np.ndarray, ex2: np.ndarray):
    R1, t1 = ex1.reshape(3, 4)[:, :3], ex1.reshape(3, 4)[:, 3]
    R2, t2 = ex2.reshape(3, 4)[:, :3], ex2.reshape(3, 4)[:, 3]
    tr = np.trace(R1.T @ R2)
    ang = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
    return ang, np.linalg.norm(t2 - t1)


def _load_image(path: str, W: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((W, W), Image.BILINEAR)
    return (np.asarray(img, np.float32) / 255.0) * 2.0 - 1.0


class RealEstate10K:
    """Training/val pair sampler."""

    def __init__(self, split: str, *, data_path: str, W: int = 256,
                 max_rotation: float = 10.0, val_rotation: float = 30.0,
                 seed: int = 0):
        self.base = data_path
        self.W = W
        self.is_train = split == "train"
        self.dataset = "test" if split == "test" else "train"
        loc = os.path.join(self.base, "frames", self.dataset, "video_loc.txt")
        vids = np.loadtxt(loc, dtype=str)
        vids = np.atleast_1d(vids)
        if split == "train":
            vids = vids[: int(0.8 * vids.shape[0])]
        elif split == "val":
            vids = vids[int(0.8 * vids.shape[0]):]
        self.videos = vids
        self.rng = np.random.RandomState(seed)
        self.max_rotation = max_rotation
        self.val_rotation = val_rotation

    def set_max_rotation(self, deg: float):
        """Rotation-curriculum hook (train_dpr.py:91-98)."""
        self.max_rotation = deg

    def totrain(self, epoch: int):
        self.__init__("train", data_path=self.base, W=self.W,
                      max_rotation=self.max_rotation,
                      val_rotation=self.val_rotation, seed=epoch)

    def toval(self, epoch: int):
        self.__init__("val", data_path=self.base, W=self.W,
                      max_rotation=self.max_rotation,
                      val_rotation=self.val_rotation, seed=epoch)

    def _frames(self, vid: str) -> np.ndarray:
        path = os.path.join(self.base, "frames", self.dataset, f"{vid}.txt")
        return np.loadtxt(path, skiprows=1)

    def sample_pair(self, max_tries: int = 1000) -> Dict[str, np.ndarray]:
        """Rejection sampler (realestate10k.py:154-216).  Bounded: a
        malformed/empty dataset raises instead of spinning forever (the
        reference instead crashes per-item and continues, train_dpr.py:104-112)."""
        thr = (self.max_rotation if self.is_train else self.val_rotation) // 2
        if self.videos.shape[0] == 0:
            raise RuntimeError("RealEstate10K: empty video list for this split")
        for _try in range(max_tries):
            vid = self.videos[self.rng.randint(self.videos.shape[0])]
            try:
                frames = self._frames(vid)
            except (OSError, ValueError):
                continue
            if frames.ndim < 2 or frames.shape[0] < 2:
                continue
            first = self.rng.choice(frames.shape[0], size=(1,))[0]
            cands = self.rng.randint(frames.shape[0] - 1,
                                     size=(frames.shape[0] // 2,))
            angles = np.array([
                _angle_trans(frames[first, 7:], frames[c, 7:])[0] for c in cands
            ])
            trans = np.array([
                _angle_trans(frames[first, 7:], frames[c, 7:])[1] for c in cands
            ])
            ok = cands[(angles > thr) & (trans < 1) & (angles < 60)]
            if len(ok) > 5:
                break
        else:
            raise RuntimeError(
                f"RealEstate10K: no valid frame pair after {max_tries} tries "
                f"(thr={thr} deg) -- dataset dir malformed or too restrictive"
            )
        second = ok[self.rng.randint(ok.shape[0])]
        return self._make_item(vid, frames, first, second)

    def _make_item(self, vid, frames, i1, i2) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        for role, idx in (("input", i1), ("output", i2)):
            img_path = os.path.join(
                self.base, "frames", self.dataset, str(vid),
                f"{int(frames[idx, 0])}.jpg",
            )
            out[f"{role}_img"] = _load_image(img_path, self.W)
            P, Pinv = habitat_merge_camera(frames[idx, 1:7], frames[idx, 7:])
            suffix = "in" if role == "input" else "out"
            out[f"P_{suffix}"] = P
            out[f"Pinv_{suffix}"] = Pinv
        out["K"] = IDENTITY4
        out["Kinv"] = IDENTITY4
        return out

    def batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        items = [self.sample_pair() for _ in range(batch_size)]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}


class RealEstate10KFixed:
    """The 3600 fixed test triples (realestate_test_indices.npy)."""

    def __init__(self, *, data_path: str, indices_path: str, W: int = 256):
        self.base = data_path
        self.W = W
        loc = os.path.join(self.base, "frames", "test", "video_loc.txt")
        self.videos = np.atleast_1d(np.loadtxt(loc, dtype=str))
        self.indices = np.load(indices_path)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        vid_i, f1, f2 = self.indices[i]
        vid = self.videos[vid_i]
        frames = np.loadtxt(
            os.path.join(self.base, "frames", "test", f"{vid}.txt"), skiprows=1
        )
        out: Dict[str, np.ndarray] = {}
        for role, idx in (("input", f1), ("output", f2)):
            img_path = os.path.join(
                self.base, "frames", "test", str(vid),
                f"{int(frames[idx, 0])}.jpg",
            )
            out[f"{role}_img"] = _load_image(img_path, self.W)
            P, Pinv = habitat_merge_camera(frames[idx, 1:7], frames[idx, 7:])
            suffix = "in" if role == "input" else "out"
            out[f"P_{suffix}"] = P
            out[f"Pinv_{suffix}"] = Pinv
        out["K"] = IDENTITY4
        out["Kinv"] = IDENTITY4
        return out
