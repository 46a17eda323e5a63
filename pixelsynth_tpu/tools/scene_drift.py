"""Scene-walk drift diagnostics: per-view GT PSNR as a function of walk depth.

VERDICT r4 missing #2: the flagship cumulative walk (z_buffermodel.py:421-592)
measured scene_gt_psnr 9.61 (random-weights floor) while single-step paired
PSNR was 18.33 -- the walk compounds error until nothing survives.  This tool
runs the walk on the relay's held-out procedural world (where GT renders
exist for EVERY camera -- a check the reference cannot make) and records the
per-(direction, numerator) GT PSNR in walk order, so the decay curve
attributes the loss: first-view extrapolation vs within-direction sweep vs
cross-direction compounding.

Run a matrix of SceneGenerator stability knobs and compare:

  python -m pixelsynth_tpu.tools.scene_drift --workdir runs/relay_r4 \
      --npz evidence/relay/stitched.npz --out evidence/scene_drift_r5.json \
      --configs reference,fixed,composite,anchor,full
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List

import numpy as np

# named knob bundles (SceneGenerator.__init__ docstring)
CONFIGS = {
    # reference-faithful walk semantics
    "reference": dict(noise_mode="per_view", carry="decoder", anchor_input=False),
    # one per-scene decoder-noise draw
    "fixed": dict(noise_mode="fixed", carry="decoder", anchor_input=False),
    # deterministic decoder (noise_scale=0)
    "zero": dict(noise_mode="zero", carry="decoder", anchor_input=False),
    # carry the pre-refinement composite instead of the decoder output
    "composite": dict(noise_mode="fixed", carry="composite", anchor_input=False),
    # reset the carry to the true input at the input pose (numerator 0)
    "anchor": dict(noise_mode="fixed", carry="decoder", anchor_input=True),
    # all three levers together
    "full": dict(noise_mode="fixed", carry="composite", anchor_input=True),
    "full_zero": dict(noise_mode="zero", carry="composite", anchor_input=True),
}


def _psnr01(pred01: np.ndarray, gt01: np.ndarray) -> float:
    mse = float(np.mean((pred01 - gt01) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-10))


def _to01(img: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(img, np.float32) * 0.5 + 0.5, 0, 1)


def walk_and_score(gen, world: Dict, W: int, *, num_split: int,
                   directions, rng_seed: int = 0,
                   dump_dir: str | None = None) -> Dict:
    """Run generate_scene on the held-out world's input view and score every
    rotation-direction view against a GT render at the same camera."""
    import jax
    import jax.numpy as jnp

    from pixelsynth_tpu.data.demo_data import demo_cameras
    from pixelsynth_tpu.data.panorama import render_view
    from pixelsynth_tpu.eval.homography import consistency_exact
    from pixelsynth_tpu.geometry.paths import get_rt_from_rot

    cams = demo_cameras(1.0)
    gt_in, _ = render_view(world, cams["P"][0], W)   # already [-1, 1]
    img = jnp.asarray(gt_in)[None]

    t0 = time.time()
    outputs = gen.generate_scene(
        img, jnp.asarray(cams["K"]), jnp.asarray(cams["Kinv"]),
        jnp.asarray(cams["P"]), jnp.asarray(cams["Pinv"]),
        directions=directions, num_split=num_split,
        rng=jax.random.PRNGKey(rng_seed),
    )
    walk_seconds = time.time() - t0

    records: List[Dict] = []
    step = 0
    prev = {}
    for direction in directions:
        from pixelsynth_tpu.geometry.paths import num_split_for_direction

        n = num_split_for_direction(direction, num_split)
        numerators = [n] + list(reversed(range(n)))
        for numerator in numerators:
            key = f"PredImg_{direction}_{numerator}"
            if key not in outputs:
                step += 1
                continue
            pred01 = _to01(outputs[key][0])
            rec = {"direction": direction, "numerator": int(numerator),
                   "walk_step": step}
            fkey = f"FeaturesImg_{direction}_{numerator}"
            if fkey in outputs:
                # splat coverage proxy: pixels with ~zero feature energy got
                # no point within radius (before bg dilation)
                fs = np.asarray(outputs[fkey][0])
                rec["fs_zero_frac"] = float(
                    (np.abs(fs).max(axis=-1) < 1e-6).mean())
            if direction not in ("S", "C"):
                _, P = get_rt_from_rot(direction, cams["P"][0], numerator, n)
                P = np.asarray(P)
                gt, _ = render_view(world, P, W)
                rec["gt_psnr"] = _psnr01(pred01, _to01(gt))
                if dump_dir is not None:
                    from PIL import Image
                    os.makedirs(dump_dir, exist_ok=True)
                    row = [_to01(gt), pred01]
                    if fkey in outputs:
                        fs01 = _to01(outputs[fkey][0][..., :3])
                        row.append(fs01)
                    panel = np.concatenate(row, axis=1)
                    Image.fromarray((panel * 255).astype(np.uint8)).save(
                        os.path.join(
                            dump_dir,
                            f"{step:03d}_{direction}_{numerator}.png"))
                if direction in prev:
                    m = consistency_exact(prev[direction][0], pred01,
                                          prev[direction][1], P)
                    rec["adjacent_psnr_vis"] = m["PSNR_vis"]
                prev[direction] = (pred01, P)
            records.append(rec)
            step += 1

    gt_vals = [r["gt_psnr"] for r in records if "gt_psnr" in r]
    adj_vals = [r["adjacent_psnr_vis"] for r in records
                if "adjacent_psnr_vis" in r]
    by_num: Dict[int, List[float]] = {}
    by_dir: Dict[str, List[float]] = {}
    for r in records:
        if "gt_psnr" in r:
            by_num.setdefault(r["numerator"], []).append(r["gt_psnr"])
            by_dir.setdefault(r["direction"], []).append(r["gt_psnr"])
    first_dir = directions[0]
    return {
        "cloud_valid_count": (int(outputs["CloudValidCount"][0])
                              if "CloudValidCount" in outputs else None),
        "scene_gt_psnr": float(np.mean(gt_vals)) if gt_vals else None,
        "scene_adjacent_consistency_psnr": (
            float(np.mean(adj_vals)) if adj_vals else None),
        "gt_psnr_by_numerator": {
            str(k): float(np.mean(v)) for k, v in sorted(by_num.items())},
        "gt_psnr_by_direction": {
            k: float(np.mean(v)) for k, v in by_dir.items()},
        "gt_psnr_first_direction": (
            float(np.mean(by_dir[first_dir])) if first_dir in by_dir else None),
        "walk_seconds": walk_seconds,
        "n_views_scored": len(gt_vals),
        "records": records,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="runs/relay_r4")
    ap.add_argument("--npz", default="evidence/relay/stitched.npz")
    ap.add_argument("--out", default="evidence/scene_drift_r5.json")
    ap.add_argument("--configs", default="reference,fixed,composite,anchor,full")
    ap.add_argument("--num-samples", type=int, default=8)
    ap.add_argument("--num-split", type=int, default=None)
    ap.add_argument("--directions", default=None,
                    help="comma list; default: checkpoint config minus S/C")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dump-dir", default=None,
                    help="save per-view [GT | pred | splat-features] panels")
    args = ap.parse_args(argv)

    from pixelsynth_tpu import demo as demo_cli
    from pixelsynth_tpu.scene import SceneGenerator

    wfile = np.load(os.path.join(args.workdir, "demo_world.npz"))
    world = {"texture": wfile["texture"],
             "base_radius": float(wfile["base_radius"]),
             "waves": [tuple(w) for w in wfile["waves"]]}

    ps, variables = demo_cli.load_model(args.npz)
    classifier_vars = variables.pop("classifier", None)
    cfg = ps.cfg
    num_split = args.num_split or cfg.sample.num_split
    if args.directions:
        directions = args.directions.split(",")
    else:
        directions = [d for d in cfg.sample.directions if d not in ("S", "C")]

    results: Dict[str, Dict] = {"meta": {
        "npz": args.npz, "num_split": num_split, "directions": directions,
        "num_samples": args.num_samples, "seed": args.seed,
        "temperature": cfg.sample.temperature,
    }}
    for name in args.configs.split(","):
        knobs = CONFIGS[name]
        gen = SceneGenerator(
            ps, variables, num_samples=args.num_samples,
            classifier_vars=classifier_vars, **knobs)
        r = walk_and_score(
            gen, world, cfg.model.W, num_split=num_split,
            directions=directions, rng_seed=args.seed,
            dump_dir=(os.path.join(args.dump_dir, name)
                      if args.dump_dir else None))
        r["knobs"] = knobs
        results[name] = r
        print(f"[{name}] gt_psnr={r['scene_gt_psnr']:.2f} "
              f"adj={r['scene_adjacent_consistency_psnr']:.2f} "
              f"first_dir={r['gt_psnr_first_direction']:.2f} "
              f"({r['walk_seconds']:.0f}s)", flush=True)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
