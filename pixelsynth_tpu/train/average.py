"""Checkpoint parameter averaging.

Mirrors models/lmconv/average_checkpoints.py:14+ (fairseq-style): the
element-wise mean of N parameter trees, used to stabilize the lmconv
prior at eval time."""

from __future__ import annotations

from typing import List, Sequence

import jax


def average_params(param_trees: Sequence) -> object:
    """Element-wise mean of parameter pytrees (all same structure)."""
    n = len(param_trees)
    assert n > 0
    out = param_trees[0]
    for t in param_trees[1:]:
        out = jax.tree.map(lambda a, b: a + b, out, t)
    return jax.tree.map(lambda a: a / n, out)


def average_checkpoints(ckpt_dir: str, steps: List[int], template) -> object:
    """Load and average the `state.variables['params']` of several steps
    from one CheckpointManager directory."""
    from pixelsynth_tpu.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt_dir)
    trees = []
    for s in steps:
        state = mgr.restore(template, step=s)
        trees.append(state.variables["params"])
    mgr.close()
    return average_params(trees)
