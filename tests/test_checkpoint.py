"""CheckpointManager retention semantics.

Regression for a crash-resume bug: with best-metric tracking, orbax keeps
the top-k steps by metric and deletes newer non-best ones, so a resume
after a crash restarted from the last *best* epoch and lost every epoch
trained since (observed on hardware: TPU worker crash at dpr epoch 19,
resume restarted at 11).  The manager now always retains the newest step
in a sibling single-slot store.
"""

import jax.numpy as jnp
import numpy as np

from pixelsynth_tpu.checkpoint import CheckpointManager


def _state(v: float):
    return {"w": jnp.full((4,), v)}


def test_best_tracking_still_retains_latest(tmp_path):
    d = str(tmp_path / "ck")
    mgr = CheckpointManager(d, max_to_keep=2, best_metric="psnr",
                            best_mode="max")
    # best at step 2; later steps all worse
    for step, psnr in [(1, 5.0), (2, 9.0), (3, 4.0), (4, 3.0), (5, 2.0)]:
        mgr.save(step, _state(float(step)), metrics={"psnr": psnr})
    assert mgr.best_step() == 2
    assert mgr.latest_step() == 5  # NOT the best-retained 2
    latest = mgr.restore(_state(0.0))
    np.testing.assert_allclose(np.asarray(latest["w"]), 5.0)
    best = mgr.restore(_state(0.0), step=mgr.best_step())
    np.testing.assert_allclose(np.asarray(best["w"]), 2.0)
    mgr.close()

    # a fresh reader (no best_metric, the load_dpr_state path) still sees
    # the newest step through the sibling store
    reader = CheckpointManager(d)
    assert reader.latest_step() == 5
    restored = reader.restore(_state(0.0))
    np.testing.assert_allclose(np.asarray(restored["w"]), 5.0)
    reader.close()


def test_plain_retention_unchanged(tmp_path):
    d = str(tmp_path / "ck2")
    mgr = CheckpointManager(d, max_to_keep=2)
    for step in (1, 2, 3):
        mgr.save(step, _state(float(step)))
    assert mgr.latest_step() == 3
    out = mgr.restore(_state(0.0))
    np.testing.assert_allclose(np.asarray(out["w"]), 3.0)
    mgr.close()
