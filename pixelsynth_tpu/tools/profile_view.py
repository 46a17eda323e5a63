"""Per-stage wall-clock profile of the scene view step on real hardware.

Times each component of SceneGenerator._view_step_impl as its own jitted
function (scalar readback per rep -- block_until_ready is unreliable over
remote platforms), then the assembled view step, so the view_seconds
headline in bench.py can be attributed stage by stage.

Usage:  python -m pixelsynth_tpu.tools.profile_view [--samples 8] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, reps=5, label=""):
    """Compile, then median of `reps` timed calls (scalar readback)."""
    f = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(jnp.asarray(x, jnp.float32)),
        fn(*a), jnp.float32(0)))
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cloud-capacity", type=int, default=4 * 65536)
    args = ap.parse_args()

    from pixelsynth_tpu.demo import demo_cameras, load_model
    from pixelsynth_tpu.geometry.paths import get_rt_from_rot
    from pixelsynth_tpu.pipeline import CloudState
    from pixelsynth_tpu.sampling import ar_sample_speculative, d_fake_score
    from pixelsynth_tpu.scene import SceneGenerator, _tile

    ps, variables = load_model(None)
    S = args.samples
    cams0 = demo_cameras(1.0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        gen = SceneGenerator(ps, variables, num_samples=S, temperature=0.7,
                             cloud_capacity=args.cloud_capacity)
    img = jnp.zeros((1, ps.W, ps.W, 3))
    RTinv, RT = get_rt_from_rot("R", cams0["P"], scene_mode=False, rotation=0.3)
    cams = {"K": cams0["K"], "Kinv": cams0["Kinv"], "P_in": cams0["P"],
            "Pinv_in": cams0["Pinv"], "P_out": np.asarray(RT)}
    cloud = CloudState.empty(1, args.cloud_capacity, 3)

    out = {}
    R = args.reps

    # stage inputs (computed once, eagerly)
    depth = jax.jit(lambda v, x: ps.regress_depth(v, x)[0])(variables["unet"], img)
    fs = img  # rgb features
    gen_fs, bg, new_cloud = jax.jit(
        lambda *a: ps.splat_cumulative(*a))(fs, depth, cams, cloud, None, cams0["Pinv"])
    order, masks, bg_ds = jax.jit(lambda b: ps.masks_for_background(b))(bg)
    codes = jax.jit(lambda v, x: ps.vq_encode(v, x)[0])(variables["vqvae"], gen_fs)

    out["depth_unet_ms"] = _time(
        lambda v, x: ps.regress_depth(v, x)[0], variables["unet"], img, reps=R) * 1e3
    out["splat_cumulative_ms"] = _time(
        lambda f, d, c: ps.splat_cumulative(f, d, cams, c, None, cams0["Pinv"])[:2],
        fs, depth, cloud, reps=R) * 1e3
    out["masks_jax_ms"] = _time(
        lambda b: ps.masks_for_background(b, host=False), bg, reps=R) * 1e3
    try:
        out["masks_host_ms"] = _time(
            lambda b: ps.masks_for_background(b, host=True), bg, reps=R) * 1e3
    except Exception as e:  # host callback may be unavailable off-CPU
        out["masks_host_ms"] = f"failed: {e}"
    out["vq_encode_ms"] = _time(
        lambda v, x: ps.vq_encode(v, x)[0], variables["vqvae"], gen_fs, reps=R) * 1e3

    # AR fill at population S
    codes_s = _tile(codes, S)
    masks_s = _tile(masks, S)
    order_s = _tile(order, S)
    bg_ds_s = _tile(bg_ds, S)
    key = jax.random.PRNGKey(0)
    l = ps.cfg.model.lmconv

    def ar_fill(c, m, o, b, k):
        lf = ps.make_sampling_logits_fn(variables["pixelcnn"], m)
        return ar_sample_speculative(
            lf, c, o, b, k, num_classes=l.num_classes, temperature=0.7,
            spec=ps.cfg.sample.speculative or 3)

    out["ar_fill_ms"] = _time(ar_fill, codes_s, masks_s, order_s, bg_ds_s,
                              key, reps=max(2, R // 2)) * 1e3
    out["n_bg_cells"] = int(jnp.sum(bg_ds >= 1.0 - 1e-6))

    sampled = jax.jit(ar_fill)(codes_s, masks_s, order_s, bg_ds_s, key)
    out["vq_decode_S_ms"] = _time(
        lambda v, s: ps.vq_decode(v, s), variables["vqvae"], sampled, reps=R) * 1e3
    decoded = jax.jit(lambda v, s: ps.vq_decode(v, s))(variables["vqvae"], sampled)
    combined = jax.jit(lambda g, d, b: ps.combine(_tile(g, S), d, _tile(b, S)))(
        gen_fs, decoded, bg)
    bg_s = _tile(bg, S)
    out["decoder_S_ms"] = _time(
        lambda v, c, b: ps.decode_image(v, c, b, rngs={"noise": key})[0],
        variables["projector"], combined, bg_s, reps=R) * 1e3
    gen_imgs = jax.jit(
        lambda v, c, b: ps.decode_image(v, c, b, rngs={"noise": key})[0])(
        variables["projector"], combined, bg_s)

    def disc_score(g, i):
        return d_fake_score(
            lambda x, train=False: ps.disc.apply(variables["disc"], x,
                                                 train=False), g, _tile(i, S))

    out["disc_2S_ms"] = _time(disc_score, gen_imgs, img, reps=R) * 1e3

    # assembled step, steady state
    def one(i):
        best, _ = gen.generate_view(img, cams, cloud, None, cams0["Pinv"],
                                    jax.random.fold_in(key, i))
        return float(jnp.asarray(best).sum())

    one(0)
    ts = []
    for i in range(1, max(3, R) + 1):
        t0 = time.perf_counter()
        one(i)
        ts.append(time.perf_counter() - t0)
    out["view_step_ms"] = float(np.median(ts)) * 1e3
    out["stage_sum_ms"] = round(sum(
        v for k, v in out.items()
        if k.endswith("_ms") and k != "view_step_ms"
        and isinstance(v, (int, float))), 1)
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
