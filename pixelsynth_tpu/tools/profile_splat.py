"""Time the splat's blend dtype on real hardware.

Measures the full splat (bin + blend + bg mask) at the bench protocol
(B=2 x 131072 points, W=256, C=64) for blend_dtype float32 vs bfloat16,
both per-dispatch and amortized inside one jitted scan (the axon tunnel
adds a ~24 ms fixed dispatch floor, evidence/profile_hotspots_r4.json,
so only the in-graph numbers resolve kernel-level deltas).

Usage: python -m pixelsynth_tpu.tools.profile_splat \
           [--out evidence/splat_blend_r4.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _inputs():
    W, N, B = 256, 65536 * 2, 2
    rng = np.random.default_rng(0)
    pts = jnp.asarray(np.stack([
        rng.uniform(-5, W + 5, (B, N)),
        rng.uniform(-5, W + 5, (B, N)),
        rng.uniform(0.5, 10.0, (B, N)),
    ], -1).astype(np.float32))
    fts = jnp.asarray(rng.normal(size=(B, N, 64)).astype(np.float32))
    vld = jnp.asarray(rng.random((B, N)) < 0.9)
    return W, pts, fts, vld


def time_splat(blend_dtype: str, reps: int = 10):
    from jax import lax

    from pixelsynth_tpu.config import SplatConfig
    from pixelsynth_tpu.ops.splat import splat

    W, pts, fts, vld = _inputs()
    cfg = SplatConfig(blend_dtype=blend_dtype)

    f = jax.jit(lambda p, ft, v: splat(p, ft, v, W=W, cfg=cfg)[0].sum())
    float(f(pts, fts, vld))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(f(pts, fts, vld))
    dispatch_ms = (time.perf_counter() - t0) / reps * 1000

    def body(carry, i):
        p = pts.at[..., 2].add(1e-3 * i.astype(jnp.float32) + 1e-6 * carry)
        img, _ = splat(p, fts, vld, W=W, cfg=cfg)
        return carry + img.sum(), None

    g = jax.jit(
        lambda: lax.scan(body, jnp.float32(0.0), jnp.arange(reps))[0])
    float(g())
    t0 = time.perf_counter()
    float(g())
    ingraph_ms = (time.perf_counter() - t0) / reps * 1000
    return round(dispatch_ms, 2), round(ingraph_ms, 2)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args(argv)

    result = {
        "protocol": ("one v5e via axon; B=2 x 131072 pts, W=256, C=64, "
                     f"argsort binning, reps={args.reps}; in-graph = "
                     "amortized inside one jitted scan (subtracts the "
                     "~24 ms tunnel dispatch floor)"),
    }
    for dt in ("float32", "bfloat16"):
        disp, ingraph = time_splat(dt, args.reps)
        result[f"splat_{dt}_dispatch_ms"] = disp
        result[f"splat_{dt}_ingraph_ms"] = ingraph
    out = json.dumps(result, indent=2)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
