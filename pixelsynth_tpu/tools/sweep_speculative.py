"""Sweep the speculative-decoding depth vs effective per-cell latency.

ar_sample_speculative (sampling.py) commits 1..spec+1 cells per PixelCNN
forward from the exact joint distribution; deeper drafts amortize more
cells per forward but lengthen the accept chain and the per-forward row
gather.  This sweeps `spec` on real hardware at the bench protocol
(pop 16, 512 background cells) so SampleConfig.speculative can be pinned
to the measured optimum.

Usage: python -m pixelsynth_tpu.tools.sweep_speculative [--specs 2,3,4,5,6,8]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--specs", default="2,3,4,5,6,8")
    ap.add_argument("--pop", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    from pixelsynth_tpu.config import Config
    from pixelsynth_tpu.models.lmconv import LMPixelCNN
    from pixelsynth_tpu.ops.lmconv_fused import make_fused_logits_fn
    from pixelsynth_tpu.ops.orders import custom_order, masks_for_orders_batch
    from pixelsynth_tpu.sampling import ar_sample_speculative

    cfg = Config()
    l = cfg.model.lmconv
    H = Wd = l.obs[1]
    NC = l.num_classes
    POP = args.pop
    model = LMPixelCNN(
        nr_resnet=l.nr_resnet, nr_filters=l.nr_filters, input_channels=NC,
        kernel_size=l.kernel_size, max_dilation=l.max_dilation,
        feature_norm=l.feature_norm, num_classes=NC,
        compute_dtype="bfloat16", backend="pallas",
    )
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    bg = np.zeros((1, H, Wd), np.float32)
    bg[:, :, Wd // 2:] = 1.0
    n_bg = int(bg.sum())
    dist = ((1 - bg) * 3 - bg * 2).astype(np.int32)[0]
    order = custom_order(dist)[None]
    a, b, d = masks_for_orders_batch([order[0]], H, Wd, l.kernel_size,
                                     l.max_dilation)
    masks1 = jnp.asarray(np.stack([a, b, d], 1))
    oh = jnp.zeros((1, H, Wd, NC))
    variables = model.init({"params": key}, oh, masks1[:, 0], masks1[:, 1],
                           masks1[:, 2], train=False)
    codes = jnp.asarray(rng.integers(0, NC, (1, H, Wd)), jnp.int32)
    codes_p = jnp.repeat(codes, POP, 0)
    order_p = jnp.repeat(jnp.asarray(order), POP, 0)
    bg_p = jnp.repeat(jnp.asarray(bg), POP, 0)
    masks_p = jnp.repeat(masks1, POP, 0)
    lf = make_fused_logits_fn(variables, masks_p, nr_resnet=l.nr_resnet,
                              max_dilation=l.max_dilation, num_classes=NC,
                              compute_dtype=l.compute_dtype)
    for spec in (int(s) for s in args.specs.split(",")):
        f = jax.jit(lambda k, s=spec: ar_sample_speculative(
            lf, codes_p, order_p, bg_p, k, num_classes=NC,
            temperature=0.7, spec=s).sum())
        int(f(key))
        t0 = time.perf_counter()
        for i in range(args.reps):
            int(f(jax.random.fold_in(key, 100 + i)))
        t = (time.perf_counter() - t0) / args.reps
        _, st = jax.jit(lambda k, s=spec: ar_sample_speculative(
            lf, codes_p, order_p, bg_p, k, num_classes=NC,
            temperature=0.7, spec=s, return_stats=True))(key)
        print(json.dumps({
            "spec": spec, "fill_s": round(t, 3),
            "cell_ms": round(t / n_bg * 1e3, 3),
            "cells_per_fwd": round(
                float(st["max_n_bg"]) / float(st["n_forwards"]), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
