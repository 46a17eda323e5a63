"""Checkpointing with orbax: typed config + variable trees + optimizer
state, preemption-safe.

Replaces the reference's three ad-hoc schemes (SURVEY.md section 5):
pickled argparse namespaces inside torch .pth files (train_dpr.py:221-241),
regex run-dir scans (train_lmconv.py:479-503), and bare state_dicts
(train_vqvae.py:129-130) -- with one orbax CheckpointManager per stage:
atomic writes, rolling retention, best-by-metric retention, and a JSON
Config alongside every step (the checkpoint remains the config source of
truth, utils/opts_helper.py semantics)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

from pixelsynth_tpu.config import Config


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        *,
        max_to_keep: int = 3,
        best_metric: Optional[str] = None,
        best_mode: str = "max",
        keep_period: Optional[int] = None,
    ):
        """keep_period keeps every N-th step forever (the reference's
        every-50-epochs snapshots, train_dpr.py:316-330)."""
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            keep_period=keep_period,
            best_fn=(lambda m: m[best_metric]) if best_metric else None,
            best_mode=best_mode,
            enable_async_checkpointing=False,
        )
        self.mgr = ocp.CheckpointManager(directory, options=options)
        # Crash/preemption robustness: with best_fn set, orbax retains the
        # top-k by metric and DELETES newer non-best steps, so a resume
        # after a crash restarts from the last *best* epoch and silently
        # loses every epoch since (observed: a TPU worker crash at epoch
        # 19 resumed from 11).  A sibling single-slot manager always keeps
        # the newest step; writers save to it only when best-tracking is
        # on, readers consult it whenever it exists.
        self._writes_latest = best_metric is not None
        latest_dir = os.path.join(directory, "latest")
        self._latest = (
            ocp.CheckpointManager(
                latest_dir,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1, enable_async_checkpointing=False),
            )
            if (self._writes_latest or os.path.isdir(latest_dir))
            else None
        )

    def save(self, step: int, state: Any, config: Optional[Config] = None,
             metrics: Optional[Dict[str, float]] = None):
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        self.mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
            ),
            metrics=metrics or None,
        )
        self.mgr.wait_until_finished()
        if self._writes_latest and self._latest is not None:
            self._latest.save(
                step,
                args=ocp.args.Composite(state=ocp.args.StandardSave(state)),
            )
            self._latest.wait_until_finished()
        if config is not None:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                f.write(config.to_json())

    def latest_step(self) -> Optional[int]:
        steps = [s for s in (self.mgr.latest_step(),
                             self._latest.latest_step() if self._latest
                             else None) if s is not None]
        return max(steps) if steps else None

    def best_step(self) -> Optional[int]:
        return self.mgr.best_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        mgr = self.mgr
        if step not in self.mgr.all_steps():
            if self._latest is None or step not in self._latest.all_steps():
                raise FileNotFoundError(
                    f"step {step} not in {self.directory} (or its latest/)")
            mgr = self._latest
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
            ),
        )
        return restored["state"]

    def load_config(self) -> Optional[Config]:
        path = os.path.join(self.directory, "config.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return Config.from_json(f.read())

    def close(self):
        self.mgr.close()
        if self._latest is not None:
            self._latest.close()


def save_variables(path: str, variables: Dict):
    """One-shot variable-tree save (for the frozen stage artifacts the
    inference stack stitches together, demo.py:198-243)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), variables, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_variables(path: str, template: Dict) -> Dict:
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(path), template)
    ckptr.close()
    return out
