"""RealEstate10K loader tests on a synthetic on-disk fixture.

Covers the host-side machinery the reference exercises only with real data:
metadata txt parsing, habitat-style camera merge (realestate10k.py:59-77,
123-140), the rejection pair sampler (:154-216) incl. its bounded-failure
behavior, the fixed-triple replay (:313-430), and the train/val re-split
(:298-310)."""

import os

import numpy as np
import pytest

from pixelsynth_tpu.data.realestate10k import (
    RealEstate10K,
    RealEstate10KFixed,
    habitat_merge_camera,
)


def _rot_y(deg):
    r = np.radians(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def make_fixture(base, n_videos=5, n_frames=12, step_deg=6.0, split="train"):
    """Write a tiny dataset dir: video_loc.txt + per-video metadata txt
    (header row + [timestamp, fx fy cx cy k1 k2, 12 extrinsics]) + frames."""
    from PIL import Image

    d = os.path.join(base, "frames", split)
    os.makedirs(d, exist_ok=True)
    vids = [f"vid{i}" for i in range(n_videos)]
    with open(os.path.join(d, "video_loc.txt"), "w") as f:
        f.write("\n".join(vids) + "\n")
    for vi, vid in enumerate(vids):
        rows = []
        os.makedirs(os.path.join(d, vid), exist_ok=True)
        for fi in range(n_frames):
            ts = 1000 * (fi + 1)
            R = _rot_y(step_deg * fi)
            t = np.array([0.01 * fi, 0.0, 0.02 * fi])
            ex = np.hstack([R, t[:, None]]).reshape(-1)
            row = [ts, 0.9, 1.2, 0.5, 0.5, 0.0, 0.0] + list(ex)
            rows.append(" ".join(f"{v:.9g}" for v in row))
            img = Image.fromarray(
                np.full((8, 8, 3), 10 * vi + fi, np.uint8))
            img.save(os.path.join(d, vid, f"{ts}.jpg"))
        with open(os.path.join(d, f"{vid}.txt"), "w") as f:
            f.write("https://example.com/video\n" + "\n".join(rows) + "\n")
    return vids


def test_camera_merge_matches_reference_layout():
    intr = np.array([0.9, 1.2, 0.5, 0.5, 0.0, 0.0])
    ex = np.hstack([_rot_y(10), np.array([[0.1], [0.2], [0.3]])]).reshape(-1)
    P, Pinv = habitat_merge_camera(intr, ex)
    # P = [[offset @ K_frame] @ [R|t]; 0 0 0 1]  (realestate10k.py:59-77)
    offset = np.array([[2, 0, -1], [0, -2, 1], [0, 0, -1]], np.float64)
    K = offset @ np.array([[0.9, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]])
    expect = K @ ex.reshape(3, 4)
    np.testing.assert_allclose(P[:3], expect, rtol=1e-5)
    assert P[3, 3] == 1 and np.allclose(P[3, :3], 0)
    np.testing.assert_allclose(P @ Pinv, np.eye(4), atol=1e-5)


def test_pair_sampler_respects_thresholds(tmp_path):
    make_fixture(str(tmp_path))
    ds = RealEstate10K("train", data_path=str(tmp_path), W=16,
                       max_rotation=10.0, seed=0)
    for _ in range(5):
        item = ds.sample_pair()
        assert item["input_img"].shape == (16, 16, 3)
        assert item["input_img"].min() >= -1 and item["input_img"].max() <= 1
        # relative rotation within the accepted window (5, 60) deg
        Rrel = (np.linalg.inv(item["Pinv_in"]) @ item["Pinv_out"])
        for k in ("P_in", "Pinv_in", "P_out", "Pinv_out", "K", "Kinv"):
            assert item[k].shape == (4, 4)
    b = ds.batch(3)
    assert b["input_img"].shape == (3, 16, 16, 3)
    assert b["P_out"].shape == (3, 4, 4)


def test_pair_sampler_bounded_on_malformed_dir(tmp_path):
    # two frames with zero relative rotation: every candidate pair rejected
    make_fixture(str(tmp_path), n_videos=2, n_frames=2, step_deg=0.0)
    ds = RealEstate10K("train", data_path=str(tmp_path), W=16, seed=0)
    with pytest.raises(RuntimeError, match="no valid frame pair"):
        ds.sample_pair(max_tries=20)
    # empty split raises immediately
    ds2 = RealEstate10K("val", data_path=str(tmp_path), W=16, seed=0)
    ds2.videos = ds2.videos[:0]
    with pytest.raises(RuntimeError, match="empty video list"):
        ds2.sample_pair(max_tries=5)


def test_train_val_split_disjoint(tmp_path):
    make_fixture(str(tmp_path), n_videos=10)
    tr = RealEstate10K("train", data_path=str(tmp_path), W=16)
    va = RealEstate10K("val", data_path=str(tmp_path), W=16)
    assert set(tr.videos).isdisjoint(set(va.videos))
    assert len(tr.videos) == 8 and len(va.videos) == 2
    # toval/totrain re-split in place (realestate10k.py:298-310)
    tr.toval(epoch=1)
    assert set(tr.videos) == set(va.videos)
    tr.totrain(epoch=1)
    assert len(tr.videos) == 8


def test_fixed_triples_replay(tmp_path):
    make_fixture(str(tmp_path), n_videos=3, split="test")
    idx = np.array([[0, 0, 5], [2, 1, 7], [1, 3, 9]])
    ipath = os.path.join(str(tmp_path), "fixed.npy")
    np.save(ipath, idx)
    ds = RealEstate10KFixed(data_path=str(tmp_path), indices_path=ipath, W=16)
    assert len(ds) == 3
    it = ds[1]
    assert it["input_img"].shape == (16, 16, 3)
    # deterministic replay
    it2 = ds[1]
    np.testing.assert_array_equal(it["input_img"], it2["input_img"])
    np.testing.assert_array_equal(it["P_out"], it2["P_out"])


def test_dpr_val_source_differs_from_train():
    """run_dpr validates on the val split, not train (train_dpr.py:294-302)."""
    from pixelsynth_tpu.config import Config
    from pixelsynth_tpu.train.loop import make_batch_source

    cfg = Config()
    cfg.dataset = "synthetic"
    cfg.model.W = 32
    cfg.train.batch_size = 2
    tr = make_batch_source(cfg, "train")
    va = make_batch_source(cfg, "val")
    assert tr.split == "train" and va.split == "val"
    bt, bv = tr(), va()
    assert not np.allclose(bt["input_img"], bv["input_img"])
