"""Regression thresholds over the committed training-evidence curves.

evidence/*.jsonl are produced by tools/training_evidence.py on real
hardware (short convergence runs per training stage); these tests assert
the committed curves clear the convergence bars so a regression that
breaks trainability is caught by CI without re-running training.
"""

import json
import os

import pytest

EV = os.path.join(os.path.dirname(__file__), "..", "evidence")


def _load(name):
    path = os.path.join(EV, name)
    if not os.path.exists(path):
        pytest.skip(f"evidence file {name} not generated yet")
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_vqvae_recon_converges():
    rows = _load("vqvae.jsonl")
    assert len(rows) >= 10
    first, last = rows[0], rows[-1]
    # recon MSE falls by >5x over the short run and PSNR trends up
    assert last["mse"] < first["mse"] / 5
    assert last["recon_psnr"] > first["recon_psnr"] + 5


def test_lmconv_bpd_converges():
    rows = _load("lmconv.jsonl")
    assert len(rows) >= 10
    first, last = rows[0], rows[-1]
    # starts near log2(512)=9 bits (uniform) and drops substantially on
    # codes extracted from the stage-1 model
    assert first["bpd"] > 5
    assert last["bpd"] < first["bpd"] * 0.5


def test_dpr_overfits_fixed_set():
    rows = _load("dpr.jsonl")
    assert len(rows) >= 10
    best = max(r["psnr"] for r in rows)
    first = rows[0]["psnr"]
    # the joint G+D step drives train-set PSNR steadily up from its
    # negative random-init value (committed run: -1.4 -> +9.5 over 16k
    # steps, still climbing -- the reference's own protocol is 125k steps)
    assert best > first + 8
    assert best > 7  # absolute floor on the committed run
    # reconstruction keeps improving through the end of the run
    assert rows[-1]["l1"] < 0.5 * rows[0]["l1"]
    assert rows[-1]["total_loss"] < rows[0]["total_loss"]
