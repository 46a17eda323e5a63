"""Produce small-scale training-convergence evidence on real hardware.

The reference ships no test suite and its implicit contract is *trained*
behavior; absent its (unavailable) trained checkpoints, this tool records
short real optimization runs for each stage so convergence is a committed,
regression-checked artifact (see tests/test_training_evidence.py):

  1. vqvae:  stage-1 recon MSE declining on image batches
     (train_vqvae.py:27-41 protocol, BASELINE config 2 trend);
  2. lmconv: stage-3 bits-per-dim declining on codes extracted from the
     stage-1 model (extract_code.py -> train_lmconv.py:662-760);
  3. dpr:    stage-2 G+D joint step overfitting a small fixed synthetic
     pair set to high PSNR (train_dpr.py protocol).

Writes evidence/<stage>.jsonl ({step, metric...} lines).  Run:
  python -m pixelsynth_tpu.tools.training_evidence --out evidence \
      --stage all --width 128
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _writer(path):
    f = open(path, "w")

    def write(step: int, **metrics):
        f.write(json.dumps({"step": step, **{k: float(v) for k, v in
                                             metrics.items()}}) + "\n")
        f.flush()

    return write, f


def _cfg(W: int):
    from pixelsynth_tpu.config import Config

    cfg = Config()
    cfg.dataset = "synthetic"
    cfg.model.W = W
    cfg.model.lmconv.obs = (3, W // 8, W // 8)
    cfg.train.batch_size = 8
    return cfg


def structured_images(rng: np.random.Generator, B: int, W: int) -> np.ndarray:
    """Piecewise-smooth scenes (gradient sky + colored rectangles): enough
    spatial structure that VQ compression and the spatial AR prior both
    have something to learn (uniform random textures are incompressible
    and pin recon MSE at the data variance)."""
    ys, xs = np.meshgrid(np.linspace(0, 1, W), np.linspace(0, 1, W),
                         indexing="ij")
    out = np.zeros((B, W, W, 3), np.float32)
    for b in range(B):
        c0 = rng.uniform(-1, 1, 3)
        gx = rng.uniform(-1, 1, 3)
        gy = rng.uniform(-1, 1, 3)
        img = c0[None, None] + xs[..., None] * gx + ys[..., None] * gy
        for _ in range(rng.integers(2, 5)):
            y0, x0 = rng.integers(0, W, 2)
            h, w = rng.integers(W // 8, W // 2, 2)
            img[y0:y0 + h, x0:x0 + w] = rng.uniform(-1, 1, 3)
        out[b] = np.clip(img, -1, 1)
    return out


def evidence_vqvae(out_dir: str, *, W: int = 128, steps: int = 1200,
                   log_every: int = 20, seed: int = 0) -> Dict:
    from pixelsynth_tpu.models.vqvae import VQVAETop
    from pixelsynth_tpu.train.vqvae import create_vqvae_state, make_vqvae_train_step

    cfg = _cfg(W)
    v = cfg.model.vqvae
    model = VQVAETop(in_channel=v.in_channel, channel=v.channel,
                     n_res_block=v.n_res_block, n_res_channel=v.n_res_channel,
                     embed_dim=v.embed_dim, n_embed=v.n_embed, decay=v.decay)
    rng = np.random.default_rng(seed)
    state, tx = create_vqvae_state(
        model, jax.random.PRNGKey(seed), lr=3e-4, img_size=W,
        init_batch=structured_images(rng, 8, W),
    )
    step_fn = make_vqvae_train_step(model, tx)
    write, f = _writer(os.path.join(out_dir, "vqvae.jsonl"))
    first = last = None
    t0 = time.time()
    for it in range(steps):
        img = jnp.asarray(structured_images(rng, cfg.train.batch_size, W))
        state, m = step_fn(state, img)
        if it % log_every == 0 or it == steps - 1:
            mse = float(m["mse"])
            recon_psnr = 10 * np.log10(4.0 / max(mse, 1e-12))  # [-1,1] range
            write(it, mse=mse, latent=float(m.get("latent", 0.0)),
                  recon_psnr=recon_psnr)
            first = first if first is not None else mse
            last = mse
    f.close()
    print(f"vqvae: mse {first:.4f} -> {last:.4f} "
          f"({steps} steps, {time.time()-t0:.0f}s)")
    return {"first_mse": first, "last_mse": last, "state": state,
            "model": model}


def evidence_lmconv(out_dir: str, *, W: int = 128, steps: int = 300,
                    log_every: int = 10, seed: int = 0,
                    vq=None) -> Dict:
    """Train the AR prior on codes extracted from the stage-1 model
    (the extract_code.py -> train_lmconv pipeline in miniature)."""
    from pixelsynth_tpu.data.synthetic import synthetic_pair_batch
    from pixelsynth_tpu.models.lmconv import LMPixelCNN
    from pixelsynth_tpu.ops.orders import (
        augment_orders, masks_for_orders_batch, raster_scan_order, s_curve_order,
    )
    from pixelsynth_tpu.train.lmconv import create_lmconv_state, make_lmconv_train_step

    cfg = _cfg(W)
    l = cfg.model.lmconv
    rows, cols = l.obs[1], l.obs[2]
    rng = np.random.default_rng(seed)

    # codes: extracted from the trained stage-1 VQ-VAE when supplied,
    # otherwise synthetic low-entropy grids
    if vq is not None:
        model_vq, state_vq = vq["model"], vq["state"]
        variables = state_vq.variables

        @jax.jit
        def encode(img):
            return model_vq.apply(variables, img, train=False,
                                  method=model_vq.encode)[3]

        batches = []
        for _ in range(8):
            img = jnp.asarray(structured_images(rng, cfg.train.batch_size, W))
            batches.append(np.asarray(encode(img)))
        codes_all = np.concatenate(batches, 0)
    else:
        base = rng.integers(0, 8, (64, rows, cols))
        codes_all = np.repeat(base, 1, 0)

    model = LMPixelCNN(nr_resnet=l.nr_resnet, nr_filters=l.nr_filters,
                       input_channels=l.input_channels,
                       kernel_size=l.kernel_size, max_dilation=l.max_dilation,
                       feature_norm=l.feature_norm, num_classes=l.num_classes)
    state, tx = create_lmconv_state(model, jax.random.PRNGKey(seed),
                                    rows=rows, cols=cols)
    step_fn = make_lmconv_train_step(model, tx)

    orders = augment_orders(raster_scan_order(rows, cols), rows, cols) + \
        augment_orders(s_curve_order(rows, cols), rows, cols)
    a, b, d = masks_for_orders_batch(orders, rows, cols, l.kernel_size,
                                     l.max_dilation)
    mask_pool = np.stack([a, b, d], 1)

    key = jax.random.PRNGKey(seed + 1)
    write, f = _writer(os.path.join(out_dir, "lmconv.jsonl"))
    first = last = None
    t0 = time.time()
    for it in range(steps):
        bidx = rng.integers(len(codes_all), size=cfg.train.batch_size)
        midx = rng.integers(len(mask_pool), size=cfg.train.batch_size)
        codes = jnp.asarray(codes_all[bidx], jnp.int32)
        masks = jnp.asarray(mask_pool[midx], jnp.float32)
        key, sub = jax.random.split(key)
        state, m = step_fn(state, codes, masks, sub)
        if it % log_every == 0 or it == steps - 1:
            bpd = float(m["bpd"])
            write(it, bpd=bpd, ce=float(m["ce"]))
            first = first if first is not None else bpd
            last = bpd
    f.close()
    print(f"lmconv: bpd {first:.3f} -> {last:.3f} "
          f"({steps} steps, {time.time()-t0:.0f}s)")
    return {"first_bpd": first, "last_bpd": last}


def evidence_dpr(out_dir: str, *, W: int = 64, steps: int = 4000,
                 log_every: int = 100, seed: int = 0,
                 n_items: int = 48) -> Dict:
    """Overfit the full G+D stage-2 step on a fixed synthetic pair set and
    track train-set PSNR (the reference's implicit trainability contract)."""
    from pixelsynth_tpu.data.synthetic import synthetic_pair_batch
    from pixelsynth_tpu.pipeline import PixelSynth
    from pixelsynth_tpu.train.dpr import (
        create_dpr_state, make_dpr_eval_step, make_dpr_train_step,
    )

    cfg = _cfg(W)
    B = cfg.train.batch_size
    ps = PixelSynth(cfg)
    variables = ps.init_variables(jax.random.PRNGKey(seed))
    state, tx_g, tx_d = create_dpr_state(ps, variables)
    step_fn = make_dpr_train_step(ps, tx_g, tx_d)
    eval_fn = make_dpr_eval_step(ps)
    # deterministic eval: zero BN-conditioning noise (the per-forward
    # redraw is what capped the r2/r3 overfit plateau — see
    # diagnose_dpr_noise and evidence/dpr_noise_diag.json)
    eval_fn_det = make_dpr_eval_step(ps, noise_scale=0.0)

    rng = np.random.default_rng(seed)
    fixed = [synthetic_pair_batch(rng, B, W) for _ in range(n_items // B)]
    fixed = [{k: jnp.asarray(v) for k, v in b.items()} for b in fixed]

    key = jax.random.PRNGKey(seed + 1)
    write, f = _writer(os.path.join(out_dir, "dpr.jsonl"))
    best = -float("inf")
    t0 = time.time()
    for it in range(steps):
        batch = fixed[it % len(fixed)]
        state, m, key = step_fn(state, batch, key)
        if it % log_every == 0 or it == steps - 1:
            key, sub = jax.random.split(key)
            evals = [eval_fn(state, b, sub) for b in fixed]
            psnr = float(np.mean([float(e["psnr"]) for e in evals]))
            # reference channel-summed [-1,1] convention AND standard
            # [0,1] PSNR (~10.8 dB apart) so the curve is legible
            psnr_std = float(np.mean([float(e["psnr_std"]) for e in evals]))
            # deterministic (zero-noise) eval in the same two conventions
            evals_det = [eval_fn_det(state, b, sub) for b in fixed]
            psnr_det = float(np.mean([float(e["psnr"]) for e in evals_det]))
            psnr_std_det = float(np.mean([float(e["psnr_std"])
                                          for e in evals_det]))
            best = max(best, psnr_det)
            write(it, psnr=psnr, psnr_std=psnr_std, psnr_det=psnr_det,
                  psnr_std_det=psnr_std_det,
                  total_loss=float(m["Total Loss"]),
                  l1=float(m.get("L1", 0.0)))
    f.close()
    print(f"dpr: best train-set deterministic-eval PSNR {best:.2f} "
          f"({steps} steps, {time.time()-t0:.0f}s)")
    diag = diagnose_dpr_noise(ps, state, fixed, key)
    with open(os.path.join(out_dir, "dpr_noise_diag.json"), "w") as jf:
        json.dump(diag, jf, indent=2)
    print("dpr noise diagnosis:", json.dumps(diag))
    return {"best_psnr": best, **diag}


def diagnose_dpr_noise(ps, state, fixed, key, n_draws: int = 8) -> Dict:
    """Quantify how much the eval-time noise injection (BigGAN
    noise-conditioned BN, models/layers.py LinearNoiseLayer -- the
    reference draws fresh noise at EVERY forward, normalization.py:21-47)
    caps the overfit PSNR plateau (round-2 VERDICT weak #8).

    Reports per-draw PSNR spread and the PSNR of the noise-averaged
    prediction: if averaging out the noise recovers several dB, the
    plateau is the noise modulation, not an optimization failure."""
    import jax

    def psnr01(pred_img, gt_img):
        p = np.clip(np.asarray(pred_img) * 0.5 + 0.5, 0, 1)
        g = np.clip(np.asarray(gt_img) * 0.5 + 0.5, 0, 1)
        mse = float(np.mean((p - g) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    @jax.jit
    def pred(batch, rng):
        _, (_, outputs, _) = ps.train_forward(
            state.gen_vars, state.frozen_vars, batch, {"noise": rng},
            train_ar=False, train=False,
        )
        return outputs["PredImg"]

    @jax.jit
    def pred_det(batch, rng):
        _, (_, outputs, _) = ps.train_forward(
            state.gen_vars, state.frozen_vars, batch, {"noise": rng},
            train_ar=False, train=False, noise_scale=0.0,
        )
        return outputs["PredImg"]

    per_draw, avg_imgs, det_imgs, gts = [], [], [], []
    for b in fixed:
        preds = np.stack([
            np.asarray(pred(b, jax.random.fold_in(key, i)))
            for i in range(n_draws)
        ])  # (n_draws, B, W, W, 3)
        gt = np.asarray(b["output_img"])
        per_draw.append([psnr01(preds[i], gt) for i in range(n_draws)])
        avg_imgs.append(preds.mean(0))
        det_imgs.append(np.asarray(pred_det(b, key)))
        gts.append(gt)
    per_draw = np.asarray(per_draw)  # (n_batches, n_draws)
    psnr_avg_pred = float(np.mean([
        psnr01(a, g) for a, g in zip(avg_imgs, gts)
    ]))
    psnr_det = float(np.mean([
        psnr01(d, g) for d, g in zip(det_imgs, gts)
    ]))
    return {
        "psnr_std_per_draw_mean": float(per_draw.mean()),
        "psnr_std_per_draw_spread": float(per_draw.std(axis=1).mean()),
        "psnr_std_noise_averaged": psnr_avg_pred,
        "psnr_std_zero_noise": psnr_det,
        "noise_cost_db": psnr_avg_pred - float(per_draw.mean()),
        "zero_noise_gain_db": psnr_det - float(per_draw.mean()),
        "n_draws": n_draws,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evidence")
    ap.add_argument("--stage", default="all",
                    choices=["all", "vqvae", "lmconv", "dpr"])
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--steps", type=int, default=None)
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    vq = None
    if args.stage in ("all", "vqvae"):
        vq = evidence_vqvae(args.out, W=args.width,
                            steps=args.steps or 1200)
    if args.stage in ("all", "lmconv"):
        evidence_lmconv(args.out, W=args.width, steps=args.steps or 300,
                        vq=vq)
    if args.stage in ("all", "dpr"):
        # full G+D step at W=128 x batch 8 exceeds a single chip's HBM;
        # the overfit evidence runs at W=64
        evidence_dpr(args.out, W=min(args.width, 64),
                     steps=args.steps or 4000)


if __name__ == "__main__":
    main()
