"""Pallas TPU bitonic sort for the splat binning keys.

XLA's TPU sort is latency-bound: every compare-exchange pass of its
sorting network is a separate fusion with fixed dispatch overhead, so a
1M-key ``lax.sort_key_val`` costs ~30 ms almost independent of size
(ROADMAP perf note 2) -- it is THE floor under the splat rasterizer's
binning stage (ops/splat._bin_points_batched).  This kernel runs the whole
bitonic network inside ONE Pallas program with the keys resident in VMEM:

  * elements live in a (R, 128) i32 grid, row-major (e = r*128 + lane);
  * XOR-partner exchanges at distances >= 128 are sublane-axis row rolls
    (``pltpu.roll``, the same primitive the fused lmconv kernel uses for
    its tap shifts); the variable-distance passes of each merge stage run
    in ONE ``fori_loop`` with a dynamic roll amount, keeping the unrolled
    program small enough for Mosaic to compile quickly;
  * distances < 128 are lane-axis: the array is viewed as (R/128, 128,
    128) and each block transposed (the TPU transpose unit), turning lane
    distances into sublane distances; one transpose round per merge stage
    covers its seven inner passes;
  * values are not sorted alongside: the value is the element's ORIGINAL
    index, generated in-kernel from an iota and carried through the
    exchanges.  Ties break lexicographically on (key, original index),
    which makes the result IDENTICAL to a stable ascending key sort --
    bit-equal to ``lax.sort_key_val(..., is_stable=True)``.

The splat binner sorts each image's candidate entries independently (tile
ids never cross images), so the kernel grids over the batch: program b
sorts its image's E entries, E a power of two >= 2**14 (pad with sentinel
keys).  E = 4N = 2**19 at the bench protocol (N = 2*65536 points): keys +
index carry = 4 MB resident, well inside ~16 MB VMEM.

Used by ops/splat when ``SplatConfig.sort_backend == "pallas"``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixelsynth_tpu.ops.masked_conv_pallas import _use_interpret

_LANES = 128
_MIN_E = _LANES * _LANES  # one (128, 128) block
MAX_E = 1 << 19  # VMEM-verified ceiling (see sort_kv_pallas docstring)


def _cmpswap(k, v, pk, pv, lower, asc):
    """One bitonic compare-exchange pass, elementwise.

    k/v: this element's key / original index; pk/pv: its XOR-partner's;
    lower: mask of elements that are the lower of their pair; asc: mask of
    elements inside ascending merge blocks.  Lexicographic (key, index)
    comparison makes the network's output equal to a stable key sort.
    """
    want_min = lower == asc
    gt = (k > pk) | ((k == pk) & (v > pv))
    lt = (k < pk) | ((k == pk) & (v < pv))
    # boolean algebra, not where(): Mosaic can't select between i1 vectors
    do = (want_min & gt) | (~want_min & lt)
    return jnp.where(do, pk, k), jnp.where(do, pv, v)


def _roll_rows(x, shift, R):
    """Circular row roll bringing x[r + shift] to row r (shift may be a
    traced value -- Mosaic lowers it to a dynamic rotate)."""
    if _use_interpret():
        return jnp.roll(x, -shift, 0)
    return pltpu.roll(x, (R - shift) % R, 0)


def _partner(x, lower, dr, R):
    """XOR partner at sublane (row) distance dr: roll rows both ways and
    pick per element (lower pairs look down the array, upper pairs up)."""
    up = _roll_rows(x, dr, R)
    down = _roll_rows(x, -dr % R if isinstance(dr, int) else R - dr, R)
    return jnp.where(lower, up, down)


def _transpose_blocks(x, R):
    """(R, 128) -> per-(128,128)-block transpose (lane <-> sublane)."""
    return x.reshape(R // _LANES, _LANES, _LANES).swapaxes(1, 2) \
            .reshape(R, _LANES)


def _sort_network(k, *, E):
    """The full bitonic network on a (R, 128) key grid; returns (k, v).

    Pure function of the key grid so tests can run the IDENTICAL network
    (including the multi-block stage>=8 direction logic) under plain
    XLA:CPU jit without Pallas interpret-mode overhead.
    """
    R = E // _LANES
    m = E.bit_length() - 1

    row = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)

    v = row * _LANES + lane  # original element index (row-major layout)

    # In the block-transposed layout T, element e = blk*2^14 + lane*128 +
    # sub with blk = row // 128 and sub = row % 128: XOR distances < 128
    # act on sub (the sublane axis), and bit `stage` of e is found in sub
    # (stage <= 6), lane bit 0 (stage == 7), or the X-layout global row
    # blk*128 + lane (stage >= 8).
    sub = row % _LANES

    def asc_t(stage):
        if stage <= 6:
            return (sub & (1 << stage)) == 0
        if stage == 7:
            return (lane & 1) == 0
        r_x = (row // _LANES) * _LANES + lane
        return (r_x & (1 << (stage - 7))) == 0

    def run_t_passes(k, v, stage, j_hi):
        """Passes j = j_hi..1 (XOR distances < 128), transposed layout."""
        asc = asc_t(stage)
        for j in range(j_hi, 0, -1):
            d = 1 << (j - 1)
            lower = (sub & d) == 0
            pk = _partner(k, lower, d, R)
            pv = _partner(v, lower, d, R)
            k, v = _cmpswap(k, v, pk, pv, lower, asc)
        return k, v

    # stages 1..7: all distances < 128 -- one transpose round covers them
    kT, vT = _transpose_blocks(k, R), _transpose_blocks(v, R)
    for stage in range(1, 8):
        kT, vT = run_t_passes(kT, vT, stage, stage)
    k, v = _transpose_blocks(kT, R), _transpose_blocks(vT, R)

    # stages 8..m: row-distance passes (one fori_loop with a dynamic roll
    # per stage -- row distances halve from 2^(stage-8) down to 1), then
    # one transpose round for the seven inner lane-axis passes
    for stage in range(8, m + 1):
        asc_x = (row & (1 << (stage - 7))) == 0

        def body(i, kv, stage=stage, asc=asc_x):
            kk, vv = kv
            dr = jnp.int32(1) << (stage - 8 - i)  # row distance
            lower = (row & dr) == 0
            pk = _partner(kk, lower, dr, R)
            pv = _partner(vv, lower, dr, R)
            return _cmpswap(kk, vv, pk, pv, lower, asc)

        k, v = jax.lax.fori_loop(0, stage - 7, body, (k, v))
        kT, vT = _transpose_blocks(k, R), _transpose_blocks(v, R)
        kT, vT = run_t_passes(kT, vT, stage, 7)
        k, v = _transpose_blocks(kT, R), _transpose_blocks(vT, R)

    return k, v


def _sort_kernel(keys_ref, out_k_ref, out_v_ref, *, E):
    k, v = _sort_network(keys_ref[0], E=E)
    out_k_ref[0] = k
    out_v_ref[0] = v


@jax.jit
def sort_kv_pallas(keys: jnp.ndarray):
    """Sort each row of ``keys`` (B, E) i32 ascending.

    Returns (sorted_keys (B, E), original_index (B, E) i32), bit-equal to a
    stable per-row sort.  E must be a power of two in [2**14, 2**19]: at
    2**20 the live VMEM working set (k+v grids plus partner/roll and
    double-buffered in/out blocks) exceeds the ~16 MB physical VMEM, so the
    cap stays at 2**19 (the bench protocol size) until a larger size is
    compile-verified on hardware.
    """
    B, E = keys.shape
    if E & (E - 1) or not (_MIN_E <= E <= MAX_E):
        raise ValueError(f"E must be a power of two in [2^14, 2^19], got {E}")
    R = E // _LANES
    kern = functools.partial(_sort_kernel, E=E)
    out_k, out_v = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.int32),
        ),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_use_interpret(),
    )(keys.reshape(B, R, _LANES).astype(jnp.int32))
    return out_k.reshape(B, E), out_v.reshape(B, E)
