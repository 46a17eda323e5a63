"""Sweep the splat's TPU implementation knobs on real hardware.

VERDICT r4 weak #4 / next #4a: the in-graph splat sat at 53.4 ms vs the
<40 ms ask, with the measured dead ends recorded (Pallas sort wins raw but
loses end-to-end; bf16 blend is a wash).  The remaining levers are the
tiling knobs themselves:

  - tile_size:          pixels per tile edge (>= 2*radius)
  - max_points_per_tile: static per-tile candidate capacity M (blend cost
                         is proportional to M; too small drops points)
  - tile_group:         tiles per lax.map step (live-memory / parallelism
                         trade)

Two protocols, both timed AMORTIZED inside one jitted scan (the axon
tunnel's ~24 ms dispatch floor otherwise swamps kernel deltas,
evidence/profile_hotspots_r4.json):

  bench: the pinned cross-round protocol (B=2 x 131072 pts, W=256, C=64)
  walk:  the scene walk's cumulative splat (B=1, 16384 current +
         cloud-capacity carried points, W=128, C=64) -- where the scene
         north-star's wall-clock actually goes; also sweeps the carried
         capacity, sized against measured occupancy (generate_scene's
         CloudValidCount; the 48-view walk peaks well under 131072).

Correctness guard: every configuration's output is compared against the
default configuration's output on the same inputs (max |delta|) -- a knob
that changes the image materially (beyond z-bucket tie reordering) is
rejected, whatever its speed.

Usage: python -m pixelsynth_tpu.tools.tune_splat \
           [--out evidence/splat_tune_r5.json] [--reps 8]
"""

from __future__ import annotations

import argparse
import itertools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _inputs(W: int, N: int, B: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(np.stack([
        rng.uniform(-5, W + 5, (B, N)),
        rng.uniform(-5, W + 5, (B, N)),
        rng.uniform(0.5, 10.0, (B, N)),
    ], -1).astype(np.float32))
    fts = jnp.asarray(rng.normal(size=(B, N, 64)).astype(np.float32))
    vld = jnp.asarray(rng.random((B, N)) < 0.9)
    return pts, fts, vld


def time_cfg(W, pts, fts, vld, cfg, reps: int):
    """Amortized in-graph ms per splat + the rendered image for the
    correctness guard."""
    from jax import lax

    from pixelsynth_tpu.ops.splat import splat

    def body(carry, i):
        p = pts.at[..., 2].add(1e-3 * i.astype(jnp.float32) + 1e-6 * carry)
        img, _ = splat(p, fts, vld, W=W, cfg=cfg)
        return carry + img.sum(), None

    f = jax.jit(lambda: lax.scan(body, jnp.float32(0.0), jnp.arange(reps))[0])
    float(f())  # compile
    t0 = time.perf_counter()
    float(f())
    ms = (time.perf_counter() - t0) / reps * 1000
    img, bg = jax.jit(
        lambda: splat(pts, fts, vld, W=W, cfg=cfg))()
    return ms, np.asarray(img), np.asarray(bg)


def sweep(W, N, B, grid, reps, base_cfg_kwargs=None):
    from pixelsynth_tpu.config import SplatConfig

    pts, fts, vld = _inputs(W, N, B)
    base = SplatConfig(**(base_cfg_kwargs or {}))
    base_ms, base_img, base_bg = time_cfg(W, pts, fts, vld, base, reps)
    rows = [{"knobs": "default", "tile_size": base.tile_size,
             "max_points_per_tile": base.max_points_per_tile,
             "tile_group": base.tile_group, "ms": round(base_ms, 2),
             "max_abs_delta": 0.0, "bg_delta_frac": 0.0}]
    for ts, M, G in grid:
        if ts < 2 * base.radius:
            continue
        cfg = SplatConfig(**{**(base_cfg_kwargs or {}),
                             "tile_size": ts, "max_points_per_tile": M,
                             "tile_group": G})
        try:
            ms, img, bg = time_cfg(W, pts, fts, vld, cfg, reps)
        except Exception as e:  # OOM etc. -- record and move on
            rows.append({"tile_size": ts, "max_points_per_tile": M,
                         "tile_group": G, "ms": f"failed: {e}"[:120]})
            continue
        rows.append({
            "tile_size": ts, "max_points_per_tile": M, "tile_group": G,
            "ms": round(ms, 2),
            "max_abs_delta": round(float(np.max(np.abs(img - base_img))), 5),
            "bg_delta_frac": round(float(np.mean(bg != base_bg)), 5),
        })
        print(rows[-1], flush=True)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args(argv)

    grid = list(itertools.product((16, 32), (512, 1024, 2048, 4096),
                                  (8, 16, 32, 64)))

    print("== bench protocol (B=2 x 131072, W=256) ==", flush=True)
    bench_rows = sweep(256, 65536 * 2, 2, grid, args.reps)

    print("== walk protocol (B=1, 16384 + capacity, W=128) ==", flush=True)
    walk = {}
    for cap in (262144, 131072, 65536):
        print(f"-- capacity {cap} --", flush=True)
        walk[str(cap)] = sweep(128, 16384 + cap, 1,
                               [(16, 2048, 32), (16, 1024, 32),
                                (32, 2048, 16), (16, 2048, 64)],
                               args.reps)

    out = {"bench": bench_rows, "walk_by_capacity": walk}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
