"""The Pallas bitonic sort (ops/sort_pallas) and its splat-binning
integration (ops/splat._bin_points_batched_pallas).

The kernel's contract is exact: bit-equal to a stable ascending key sort
(ties broken by original index, which IS the stable order).  The binning
test then checks the whole pallas-sort binning path produces the identical
(slot_point_idx, slot_valid) tables as the shipped XLA-sort path at a
protocol where both use 16 depth-bucket bits.

Interpret mode on CPU (conftest pins JAX_PLATFORMS=cpu); the same network
compiles for TPU via Mosaic (dynamic-rotate partner exchange + per-block
transposes) -- hardware timing lives in bench.py.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pixelsynth_tpu.config import SplatConfig  # noqa: E402
from pixelsynth_tpu.ops.sort_pallas import sort_kv_pallas  # noqa: E402


def test_sort_matches_stable_argsort():
    rng = np.random.default_rng(0)
    B, E = 2, 1 << 14
    keys = rng.integers(0, 500, size=(B, E)).astype(np.int32)  # dup-heavy
    keys[1, E // 2:] = np.int32(257 << 16)  # constant sentinel tail
    sk, sv = map(np.asarray, sort_kv_pallas(jnp.asarray(keys)))
    for b in range(B):
        ref = np.argsort(keys[b], kind="stable")
        assert np.array_equal(sk[b], keys[b][ref])
        assert np.array_equal(sv[b], ref)


def test_binning_pallas_matches_xla():
    from pixelsynth_tpu.ops.splat import (
        _bin_points_batched,
        _bin_points_batched_pallas,
    )

    rng = np.random.default_rng(1)
    B, N, W = 2, 4096, 64  # E = 4N = 2^14
    pts = np.stack([
        rng.uniform(-5, W + 5, (B, N)),
        rng.uniform(-5, W + 5, (B, N)),
        rng.uniform(0.5, 10.0, (B, N)),
    ], -1).astype(np.float32)
    valid = rng.random((B, N)) < 0.9
    cfg = SplatConfig(max_points_per_tile=2048)

    ref_idx, ref_ok = _bin_points_batched(
        jnp.asarray(pts), jnp.asarray(valid), W, cfg)
    got_idx, got_ok = _bin_points_batched_pallas(
        jnp.asarray(pts), jnp.asarray(valid), W, cfg)
    assert np.array_equal(np.asarray(ref_ok), np.asarray(got_ok))
    ok = np.asarray(ref_ok)
    # point ids only meaningful in valid slots
    assert np.array_equal(np.asarray(ref_idx)[ok], np.asarray(got_idx)[ok])


def test_sort_network_multiblock():
    """E >= 2^15 exercises the multi-block direction logic (asc_t for
    stage >= 8 via r_x with blk > 0) that the 2^19 bench protocol depends
    on.  Runs the IDENTICAL network body (_sort_network) under plain
    XLA:CPU jit -- interpret-mode pallas at this size would take minutes."""
    import functools

    from pixelsynth_tpu.ops.sort_pallas import _LANES, _sort_network

    rng = np.random.default_rng(2)
    for E in (1 << 15, 1 << 16):
        keys = rng.integers(0, 1000, size=E).astype(np.int32)  # dup-heavy
        grid = jnp.asarray(keys.reshape(E // _LANES, _LANES))
        k, v = jax.jit(functools.partial(_sort_network, E=E))(grid)
        ref = np.argsort(keys, kind="stable")
        assert np.array_equal(np.asarray(k).reshape(-1), keys[ref])
        assert np.array_equal(np.asarray(v).reshape(-1), ref)


def test_sort_rejects_oversized():
    from pixelsynth_tpu.ops.sort_pallas import MAX_E

    with pytest.raises(ValueError):
        sort_kv_pallas(jnp.zeros((1, MAX_E * 2), jnp.int32))
