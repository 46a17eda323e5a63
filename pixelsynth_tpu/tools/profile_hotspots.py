"""Bisect the view-step's two dominant stages (depth U-Net, refinement
decoder) into primitive costs on real hardware.

VERDICT r3 measured depth_unet 1,028 ms and decoder_S 775 ms per view --
two stock conv nets costing a second apiece.  This tool times each net
whole, then with single knobs flipped (spectral norm off, bf16 convs,
upsample variants, conv ladder alone) so the pathology is attributed to a
primitive, not guessed at.

Usage: python -m pixelsynth_tpu.tools.profile_hotspots [--reps 5]
Prints one JSON dict of stage -> ms.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, reps=5):
    f = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(jnp.asarray(x, jnp.float32)),
        fn(*a), jnp.float32(0)))
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return round(float(np.median(ts)) * 1e3, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--W", type=int, default=256)
    ap.add_argument("--S", type=int, default=8)
    args = ap.parse_args()
    R = args.reps
    W, S = args.W, args.S

    from pixelsynth_tpu.config import Config
    from pixelsynth_tpu.models.layers import upsample2x
    from pixelsynth_tpu.models.unet import UNet
    from pixelsynth_tpu.pipeline import PixelSynth

    out = {}
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((1, W, W, 3))

    # --- U-Net variants -----------------------------------------------------
    def unet_ms(label, **kw):
        net = UNet(**kw)
        vs = net.init({"params": key}, img, train=False)
        out[label] = _time(
            lambda v, x: net.apply(v, x, train=False), vs, img, reps=R)

    unet_ms("unet_full_ms", spectral=True)
    unet_ms("unet_nospectral_ms", spectral=False)

    # --- primitive ladder ---------------------------------------------------
    # the U-Net's encoder convs, one jit per (resolution, cin, cout)
    ladder = [(W, 3, 32), (W // 2, 32, 64), (W // 4, 64, 128),
              (W // 8, 128, 256), (W // 16, 256, 256)]
    for res, cin, cout in ladder:
        x = jnp.zeros((1, res, res, cin))
        k = jnp.zeros((4, 4, cin, cout))
        for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            out[f"conv4x4s2_{res}_{cin}to{cout}_{tag}_ms"] = _time(
                lambda a, b: jax.lax.conv_general_dilated(
                    a.astype(dt), b.astype(dt), (2, 2), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")),
                x, k, reps=R)

    # upsample primitives at the decoder's big end
    for res, c in ((W // 2, 64), (W // 4, 128)):
        x = jnp.zeros((S, res, res, c))
        out[f"resize_bilinear_{res}x{c}_S{S}_ms"] = _time(upsample2x, x, reps=R)
        out[f"upsample_nn_{res}x{c}_S{S}_ms"] = _time(
            lambda a: jnp.repeat(jnp.repeat(a, 2, 1), 2, 2), x, reps=R)

    # --- refinement decoder at population S ---------------------------------
    cfg = Config()
    ps = PixelSynth(cfg)
    pvars = ps.projector.init(
        {"params": key, "noise": key},
        jnp.zeros((1, W, W, 3)), jnp.zeros((1, W, W), bool), train=False)
    comb = jnp.zeros((S, W, W, 3))
    bg = jnp.zeros((S, W, W), bool)
    out["decoder_S_ms"] = _time(
        lambda v, c: ps.decode_image(v, c, bg, rngs={"noise": key})[0],
        pvars, comb, reps=R)
    out["decoder_S1_ms"] = _time(
        lambda v, c: ps.decode_image(v, c, bg[:1], rngs={"noise": key})[0],
        pvars, comb[:1], reps=R)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
