"""Relay driver plumbing: --force-from must purge downstream stage state.

The stage drivers resume from their checkpoint dirs (run_dpr resumes epoch
numbering), so a forced re-run that leaves stale state behind silently
skips retraining -- observed in the round-3 relay where a completed stale
dpr_final would have trained zero epochs against a freshly-retrained
vqvae.
"""

import json
import os

from pixelsynth_tpu.tools.run_relay import (
    STAGE_STATE,
    STAGES,
    _marker,
    _purge_stage_state,
)


def test_stage_state_covers_all_stages():
    assert set(STAGE_STATE) == set(STAGES)


def test_purge_removes_dirs_files_and_marker(tmp_path):
    wd = str(tmp_path)
    os.makedirs(os.path.join(wd, "dpr_final", "dpr", "28"))
    with open(os.path.join(wd, "dpr_final", "dpr", "28", "state"), "w") as f:
        f.write("x")
    with open(_marker(wd, "dpr"), "w") as f:
        json.dump({"stage": "dpr"}, f)
    # unrelated state survives
    os.makedirs(os.path.join(wd, "vqvae"))

    _purge_stage_state(wd, "dpr")

    assert not os.path.exists(os.path.join(wd, "dpr_final"))
    assert not os.path.exists(_marker(wd, "dpr"))
    assert os.path.isdir(os.path.join(wd, "vqvae"))


def test_purge_missing_state_is_noop(tmp_path):
    _purge_stage_state(str(tmp_path), "lmconv")  # nothing there: no raise
