"""The end-to-end relay: train every stage chained the way the product
works, stitch ONE scene-generating checkpoint, and measure it.

This is the reference's canonical 6-step pipeline (docs/REALESTATE.md:56-70)
run for real, at reduced-but-honest scale, on geometrically exact panorama
worlds (data/panorama.py):

  data     pano shards (train/val) + a held-out demo world
  vqvae    stage 1 on shard images                 (train_vqvae.py)
  codes    extract_code with the trained VQ        (extract_code.py)
  dpr_pre  stage 2 --pretrain, no AR head          (train_dpr.py:436)
  orders   extract_pixcnn_orders w/ the pretrained model
                                                   (extract_pixcnn_orders.py)
  lmconv   stage 3 on those codes + orders         (train_lmconv.py)
  dpr      stage 2 full: frozen trained VQ, AR head initialized from the
           stage-3 prior                           (train_dpr.py:389-434)
  stitch   one checkpoint the demo CLI loads       (demo.py:198-243)
  report   gen_paired PSNR vs a no-outpaint baseline, exact-homography
           view consistency, a full demo scene walk, PNG evidence

Stages are resumable: each writes a <stage>.done.json marker; delete a
marker (or pass --force-from STAGE) to re-run from there.

Usage (full relay, real chip, ~1-2 h):
  python -m pixelsynth_tpu.tools.run_relay --workdir runs/relay \
      --evidence evidence/relay
Smoke (CPU, minutes): add --smoke
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pixelsynth_tpu.config import Config

STAGES = ["data", "vqvae", "codes", "dpr_pre", "orders", "lmconv", "dpr",
          "classifier", "stitch", "report"]


# ---------------------------------------------------------------------------
# plumbing
# ---------------------------------------------------------------------------


def _marker(workdir: str, stage: str) -> str:
    return os.path.join(workdir, f"{stage}.done.json")


def _is_done(workdir: str, stage: str) -> bool:
    return os.path.exists(_marker(workdir, stage))


def _mark_done(workdir: str, stage: str, summary: Dict):
    summary = {k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
               for k, v in summary.items()}
    with open(_marker(workdir, stage), "w") as f:
        json.dump({"stage": stage, "time": time.time(), **summary}, f, indent=2)


def _read_marker(workdir: str, stage: str) -> Dict:
    with open(_marker(workdir, stage)) as f:
        return json.load(f)


def relay_config(width: int, data_dir: str) -> Config:
    cfg = Config()
    cfg.dataset = "habitat"
    cfg.train_data_path = data_dir
    cfg.model.W = width
    cfg.model.lmconv.obs = (3, width // 8, width // 8)
    cfg.model.train_depth = True          # pano shards carry GT depth
    cfg.model.lmconv.ema_decay = 0.9995
    # 8 candidates per view (r3 used 4): the r4 device-placement fix cut
    # the view step 12x, so a bigger ranked population is nearly free and
    # the new classifier entropy term has real candidates to rank
    cfg.sample.num_samples = 8
    cfg.sample.num_split = 8
    cfg.sample.temperature = 0.7
    return cfg


def _with_batch(cfg: Config, batch_size: int) -> Config:
    out = copy.deepcopy(cfg)
    out.train.batch_size = batch_size
    return out


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------


def stage_data(cfg: Config, workdir: str, s: Dict):
    from pixelsynth_tpu.data.panorama import camera_pose, make_world, render_view
    from pixelsynth_tpu.eval.harness import save_png
    from pixelsynth_tpu.tools.export_habitat_shards import export_synthetic

    data_dir = cfg.train_data_path
    n = export_synthetic(
        data_dir, num_pairs=s["n_train"], shard_size=s["shard_size"],
        W=cfg.model.W, max_rotation=s["max_rotation"], seed=0, split="train",
        world="pano",
    )
    nv = export_synthetic(
        data_dir, num_pairs=s["n_val"], shard_size=s["shard_size"],
        W=cfg.model.W, max_rotation=s["max_rotation"], seed=777, split="val",
        world="pano",
    )
    # held-out demo world: input view from the origin at identity yaw ==
    # exactly the demo CLI's camera (demo.py:27-45; test_panorama.py proves
    # the convention match).  Reject worlds whose rendered input view is
    # near-featureless (r3's demo world was a flat green gradient -- the
    # scene strips could not demonstrate structure preservation): require
    # real per-channel variance AND edge energy in the visible window.
    rng = np.random.default_rng(31337)
    P0 = camera_pose(np.zeros(3), np.zeros(3))
    world, img, depth = None, None, None
    best = (-1.0, None, None, None)
    for _ in range(64):
        cand = make_world(rng)
        cimg, cdepth = render_view(cand, P0, cfg.model.W)
        std = float(np.mean(np.std(cimg, axis=(0, 1))))
        edges = float(np.mean(np.abs(np.diff(cimg, axis=0))) +
                      np.mean(np.abs(np.diff(cimg, axis=1))))
        score = std + 4.0 * edges
        if score > best[0]:
            best = (score, cand, cimg, cdepth)
        if std > 0.3 and edges > 0.015:
            world, img, depth = cand, cimg, cdepth
            break
    if world is None:  # fall back to the most structured candidate seen
        _, world, img, depth = best
    save_png(os.path.join(workdir, "demo_input.png"), img)
    np.savez(os.path.join(workdir, "demo_world.npz"),
             texture=world["texture"], base_radius=world["base_radius"],
             waves=np.array([list(w) for w in world["waves"]], np.float64),
             depth0=depth)
    return {"train_shards": n, "val_shards": nv}


def _best_val_mse(workdir: str) -> float:
    """Best (min) held-out MSE across epochs -- what the best-ckpt that
    stage_codes loads was selected on."""
    path = os.path.join(workdir, "vqvae_metrics.jsonl")
    best = float("inf")
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "val_mse" in rec:
                best = min(best, float(rec["val_mse"]))
    return best


def stage_vqvae(cfg: Config, workdir: str, s: Dict):
    """Stage 1 with a convergence gate: relay attempt 1 failed its quality
    gate solely because this stage converged 8x worse than its own evidence
    run (val_mse 0.055 vs ~0.007 -- evidence/relay_attempt1/README.md); a
    bad codebook bounds everything decoded downstream.  Retry with a fresh
    seed rather than silently feeding a bad VQ to six more stages."""
    from pixelsynth_tpu.train.loop import run_vqvae

    gate = s.get("vq_gate_mse", float("inf"))
    best = float("inf")
    last: Dict = {}
    for attempt in range(s.get("vq_attempts", 3)):
        c = _with_batch(cfg, s["vq_batch"])
        c.train.seed = cfg.train.seed + 1000 * attempt
        if attempt:
            print(f"[relay] vqvae: best val_mse {best:.4f} > gate {gate}, "
                  f"retraining with seed {c.train.seed}")
            _purge_stage_state(workdir, "vqvae")
        last = run_vqvae(
            c, workdir,
            epochs=s["vq_epochs"], iters_per_epoch=s["iters_per_epoch"],
        )
        best = _best_val_mse(workdir)
        last["best_val_mse"] = best
        last["vq_attempt"] = attempt
        if best <= gate:
            return last
    raise RuntimeError(
        f"vqvae convergence gate failed after retries: best val_mse "
        f"{best:.4f} > {gate} -- refusing to train downstream stages "
        f"against a bad codebook")


def _load_vq_vars(cfg: Config, workdir: str) -> Dict:
    from pixelsynth_tpu.tools.stitch_checkpoint import load_vqvae_variables

    return load_vqvae_variables(os.path.join(workdir, "vqvae"), cfg)


def stage_codes(cfg: Config, workdir: str, s: Dict):
    """Encode every shard image (both views) with the trained VQ
    (extract_code.py:17-50)."""
    import glob as _glob

    from pixelsynth_tpu.models.vqvae import VQVAETop

    v = cfg.model.vqvae
    model = VQVAETop(in_channel=v.in_channel, channel=v.channel,
                     n_res_block=v.n_res_block, n_res_channel=v.n_res_channel,
                     embed_dim=v.embed_dim, n_embed=v.n_embed, decay=v.decay)
    variables = _load_vq_vars(cfg, workdir)

    @jax.jit
    def encode(img):
        return model.apply(variables, img, train=False, method=model.encode)[3]

    out = {}
    for split in ("train", "val"):
        paths = sorted(_glob.glob(
            os.path.join(cfg.train_data_path, f"{split}_*.npz")))
        codes = []
        for p in paths:
            shard = np.load(p)
            imgs = shard["images"].astype(np.float32) / 255.0 * 2.0 - 1.0
            flat = imgs.reshape(-1, *imgs.shape[2:])
            for i in range(0, len(flat), 64):
                codes.append(np.asarray(encode(jnp.asarray(flat[i:i + 64]))))
        codes = np.concatenate(codes).astype(np.int32)
        np.save(os.path.join(workdir, f"codes_{split}.npy"), codes)
        out[f"n_codes_{split}"] = int(len(codes))
        out[f"codes_used_{split}"] = int(len(np.unique(codes)))
    return out


def stage_dpr_pre(cfg: Config, workdir: str, s: Dict):
    from pixelsynth_tpu.train.loop import run_dpr

    vq_vars = _load_vq_vars(cfg, workdir)
    return run_dpr(
        _with_batch(cfg, s["dpr_batch"]), os.path.join(workdir, "dpr_pre"),
        epochs=s["dpr_pre_epochs"], iters_per_epoch=s["iters_per_epoch"],
        val_iters=s["val_iters"], train_ar=False,
        init_vars={"vqvae": vq_vars},
    )


def stage_orders(cfg: Config, workdir: str, s: Dict):
    """Per-image generation orders from the pretrained model's actual
    reprojection background masks (extract_pixcnn_orders.py:29-57)."""
    import glob as _glob

    from pixelsynth_tpu.pipeline import PixelSynth
    from pixelsynth_tpu.tools.stitch_checkpoint import load_dpr_state

    ps, state, _ = load_dpr_state(os.path.join(workdir, "dpr_pre", "dpr"), cfg)
    variables = {**state.gen_vars, **state.frozen_vars}

    @jax.jit
    def gen_order(img, cams):
        depth, _ = ps.regress_depth(variables["unet"], img)
        fs, _ = ps.features(variables, img)
        _, bg, _ = ps.splat_view(fs, depth, cams)
        order, _, _ = ps.masks_for_background(bg)
        return order

    paths = sorted(_glob.glob(
        os.path.join(cfg.train_data_path, "train_*.npz")))
    orders = []
    want = s["n_orders"]
    for p in paths:
        if len(orders) * 8 >= want:
            break
        shard = np.load(p)
        imgs = shard["images"][:, 0].astype(np.float32) / 255.0 * 2.0 - 1.0
        n = min(len(imgs), want - len(orders) * 8)
        for i in range(0, n, 8):
            j = min(i + 8, n)
            cams = {
                "K": jnp.asarray(np.repeat(shard["K"][None], j - i, 0)),
                "Kinv": jnp.asarray(np.repeat(shard["Kinv"][None], j - i, 0)),
                "P_in": jnp.asarray(shard["P"][i:j, 0]),
                "Pinv_in": jnp.asarray(shard["Pinv"][i:j, 0]),
                "P_out": jnp.asarray(shard["P"][i:j, 1]),
            }
            orders.append(np.asarray(gen_order(jnp.asarray(imgs[i:j]), cams)))
    orders = np.concatenate(orders).astype(np.int32)[:want]
    np.save(os.path.join(workdir, "orders.npy"), orders)
    return {"n_orders": int(len(orders))}


def stage_lmconv(cfg: Config, workdir: str, s: Dict):
    from pixelsynth_tpu.train.loop import run_lmconv

    vq_vars = _load_vq_vars(cfg, workdir)
    return run_lmconv(
        _with_batch(cfg, s["lm_batch"]), workdir,
        epochs=s["lm_epochs"], iters_per_epoch=s["iters_per_epoch"],
        codes_path=os.path.join(workdir, "codes_train.npy"),
        orders_path=os.path.join(workdir, "orders.npy"),
        preview_every=max(s["lm_epochs"] // 4, 1), vq_variables=vq_vars,
    )


def stage_dpr(cfg: Config, workdir: str, s: Dict):
    from pixelsynth_tpu.tools.stitch_checkpoint import (
        load_dpr_state,
        load_lmconv_variables,
    )
    from pixelsynth_tpu.train.loop import run_dpr

    vq_vars = _load_vq_vars(cfg, workdir)
    lm_vars = load_lmconv_variables(os.path.join(workdir, "lmconv"), cfg)
    _, pre, _ = load_dpr_state(os.path.join(workdir, "dpr_pre", "dpr"), cfg)
    init_vars = {
        **{k: v for k, v in pre.gen_vars.items() if k != "pixelcnn"},
        "vqvae": vq_vars,
        "pixelcnn": lm_vars,
        "disc": pre.disc_vars,
    }
    return run_dpr(
        _with_batch(cfg, s["dpr_batch"]), os.path.join(workdir, "dpr_final"),
        epochs=s["dpr_epochs"], iters_per_epoch=s["iters_per_epoch"],
        val_iters=s["val_iters"], train_ar=True, init_vars=init_vars,
    )


def _val_bpd(cfg: Config, pcnn_vars: Dict, codes: np.ndarray,
             orders: np.ndarray, n_batches: int = 4, batch: int = 16) -> float:
    """Held-out AR bpd under pool masks (used to pick the stitched prior)."""
    from pixelsynth_tpu.models.lmconv import LMPixelCNN
    from pixelsynth_tpu.ops.orders import masks_for_orders_batch

    l = cfg.model.lmconv
    rows, cols = l.obs[1], l.obs[2]
    model = LMPixelCNN(
        nr_resnet=l.nr_resnet, nr_filters=l.nr_filters,
        input_channels=l.input_channels, kernel_size=l.kernel_size,
        max_dilation=l.max_dilation, feature_norm=l.feature_norm,
        num_classes=l.num_classes,
    )
    a, b, d = masks_for_orders_batch(list(orders[:batch]), rows, cols,
                                     l.kernel_size, l.max_dilation)
    masks = jnp.asarray(np.stack([a, b, d], 1), jnp.float32)

    @jax.jit
    def ce(c):
        oh = jax.nn.one_hot(c, l.num_classes)
        logits = model.apply(pcnn_vars, oh, masks[:, 0], masks[:, 1],
                             masks[:, 2], train=False)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, c[..., None], -1))

    rng = np.random.default_rng(5)
    vals = []
    for _ in range(n_batches):
        idx = rng.integers(len(codes), size=batch)
        vals.append(float(ce(jnp.asarray(codes[idx], jnp.int32))))
    return float(np.mean(vals) / np.log(2.0))


def stage_classifier(cfg: Config, workdir: str, s: Dict):
    """Train the re-ranking scene classifier so the stitched artifact ranks
    candidates with BOTH terms (0.5*D_Fake + 0.5*classifier entropy) the
    way the reference always does (z_buffermodel.py:244-276,
    demo.py:233-243).  Trained at 224 px to match the rank-time
    preprocess_for_classifier resize.  Gated on held-out-view accuracy:
    a classifier at chance would make the entropy term noise."""
    from pixelsynth_tpu.tools.train_scene_classifier import (
        train_scene_classifier,
    )

    gate = s.get("classifier_gate_acc", 0.7)
    best: Dict = {"val_accuracy": -1.0}
    for attempt in range(2):
        out = train_scene_classifier(
            workdir, num_worlds=s.get("classifier_worlds", 32),
            steps=s.get("classifier_steps", 600),
            batch=16, image_size=s.get("classifier_size", 224),
            seed=11 + 1000 * attempt)
        if out["val_accuracy"] >= best["val_accuracy"]:
            best = out
        if out["val_accuracy"] >= gate:
            return out
    raise RuntimeError(
        f"scene classifier gate failed: val_accuracy "
        f"{best['val_accuracy']:.3f} < {gate} after retries")


def stage_stitch(cfg: Config, workdir: str, s: Dict):
    from pixelsynth_tpu.tools.stitch_checkpoint import (
        load_dpr_state,
        load_lmconv_variables,
        stitch,
    )

    codes_val = np.load(os.path.join(workdir, "codes_val.npy"))
    orders = np.load(os.path.join(workdir, "orders.npy"))
    dpr_dir = os.path.join(workdir, "dpr_final", "dpr")

    # pick the sampling prior: the stage-3 EMA prior (reference demo
    # semantics -- autoregressive.pth wins, demo.py:208-218) vs the
    # DPR-joint-tuned head; lower held-out bpd wins
    _, state, _ = load_dpr_state(dpr_dir, cfg)
    bpd_dpr = _val_bpd(cfg, state.gen_vars["pixelcnn"], codes_val, orders)
    lm_vars = load_lmconv_variables(os.path.join(workdir, "lmconv"), cfg)
    bpd_lm = _val_bpd(cfg, lm_vars, codes_val, orders)
    use_lm = bpd_lm <= bpd_dpr

    cls_npz = os.path.join(workdir, "scene_classifier.npz")
    stitch(
        dpr_dir, os.path.join(workdir, "stitched"),
        vqvae_dir=os.path.join(workdir, "vqvae"),
        lmconv_dir=os.path.join(workdir, "lmconv") if use_lm else None,
        npz_path=os.path.join(s["evidence_dir"], "stitched.npz"),
        classifier_npz=cls_npz if os.path.exists(cls_npz) else None,
        meta={"val_bpd_lmconv_ema": bpd_lm, "val_bpd_dpr_joint": bpd_dpr,
              "prior": "lmconv_ema" if use_lm else "dpr_joint"},
    )
    npz = os.path.join(s["evidence_dir"], "stitched.npz")
    return {"val_bpd_lmconv_ema": bpd_lm, "val_bpd_dpr_joint": bpd_dpr,
            "prior": "lmconv_ema" if use_lm else "dpr_joint",
            "classifier_stitched": os.path.exists(cls_npz),
            "npz_mb": os.path.getsize(npz) / 1e6}


def stage_report(cfg: Config, workdir: str, s: Dict):
    from pixelsynth_tpu.eval.relay_report import build_report

    return build_report(cfg, workdir, s["evidence_dir"],
                        num_samples=cfg.sample.num_samples,
                        scene_num_split=cfg.sample.num_split,
                        smoke=s.get("smoke", False))


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def settings(smoke: bool, width: int, evidence_dir: str,
             profile: str = "full") -> Dict:
    if smoke:
        return dict(
            n_train=96, n_val=32, shard_size=32, max_rotation=35.0,
            iters_per_epoch=4, val_iters=2, vq_batch=8, vq_epochs=2,
            dpr_batch=2, dpr_pre_epochs=1, dpr_epochs=1, lm_batch=8,
            lm_epochs=2, n_orders=32, evidence_dir=evidence_dir, smoke=True,
            classifier_steps=4, classifier_gate_acc=0.0, classifier_size=32,
            classifier_worlds=4,
        )
    if profile == "fast":
        # wall-clock-budgeted relay (~45 min on one v5e): same chained
        # pipeline and gates at roughly half the step counts.  Used when a
        # session cannot fit the full profile; the report stage measures
        # the artifact the same way either way.
        return dict(
            n_train=2048, n_val=192, shard_size=512, max_rotation=40.0,
            iters_per_epoch=250, val_iters=12, vq_batch=32, vq_epochs=8,
            dpr_batch=4, dpr_pre_epochs=8, dpr_epochs=12, lm_batch=32,
            lm_epochs=12, n_orders=1024, evidence_dir=evidence_dir,
            smoke=False, vq_gate_mse=0.02, vq_attempts=2,
            classifier_steps=400, classifier_gate_acc=0.6,
        )
    if profile == "session":
        # full-profile DATA (the 8192-pair pool is the generalization
        # lever against the r3 train-1.99/val-2.70 bpd gap) with epoch
        # counts trimmed to fit one ~2 h session end to end; every gate
        # (vq convergence, classifier accuracy, report protocol) is
        # identical to the full profile
        return dict(
            n_train=8192, n_val=256, shard_size=512, max_rotation=40.0,
            iters_per_epoch=250, val_iters=16, vq_batch=32, vq_epochs=16,
            dpr_batch=4, dpr_pre_epochs=10, dpr_epochs=16, lm_batch=32,
            lm_epochs=20, n_orders=2048, evidence_dir=evidence_dir,
            smoke=False, vq_gate_mse=0.02, vq_attempts=3,
        )
    return dict(
        # r4: n_train 4096 -> 8192 and n_orders 2048 -> 4096 attack the
        # stage-3 generalization gap VERDICT r3 measured (train bpd 1.99
        # vs val 2.70) -- the worlds are procedural, so data is the cheap
        # regularizer
        n_train=8192, n_val=256, shard_size=512, max_rotation=40.0,
        iters_per_epoch=250, val_iters=16, vq_batch=32, vq_epochs=16,
        dpr_batch=4, dpr_pre_epochs=20, dpr_epochs=28, lm_batch=32,
        lm_epochs=36, n_orders=4096, evidence_dir=evidence_dir, smoke=False,
        # relay attempt 1 failed at 0.055; the healthy runs land ~0.007
        vq_gate_mse=0.02, vq_attempts=3,
    )


STAGE_FNS = {
    "data": stage_data, "vqvae": stage_vqvae, "codes": stage_codes,
    "dpr_pre": stage_dpr_pre, "orders": stage_orders, "lmconv": stage_lmconv,
    "dpr": stage_dpr, "classifier": stage_classifier,
    "stitch": stage_stitch, "report": stage_report,
}

# on-disk state each stage leaves behind (relative to workdir).  A re-run
# forced by --force-from must purge these: the stage drivers RESUME from
# their checkpoint dirs, so stale state from a prior relay would silently
# skip retraining (run_dpr resumes epoch numbering -- a completed stale
# dpr_final would train ZERO epochs against the freshly-retrained vqvae).
STAGE_STATE = {
    "data": ["shards", "demo_input.png", "demo_world.npz"],
    "vqvae": ["vqvae", "vqvae_samples", "vqvae_metrics.jsonl"],
    "codes": ["codes_train.npy", "codes_val.npy"],
    "dpr_pre": ["dpr_pre"],
    "orders": ["orders.npy"],
    "lmconv": ["lmconv", "lmconv_samples", "lmconv_metrics.jsonl"],
    "dpr": ["dpr_final"],
    "classifier": ["scene_classifier.npz", "scene_classifier.json"],
    "stitch": ["stitched"],
    "report": [],
}


def _purge_stage_state(workdir: str, stage: str):
    import shutil

    for rel in STAGE_STATE.get(stage, []):
        path = os.path.join(workdir, rel)
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)
    marker = _marker(workdir, stage)
    if os.path.exists(marker):
        os.remove(marker)


def run_relay(workdir: str, evidence_dir: str, *, width: int = 128,
              smoke: bool = False, force_from: Optional[str] = None,
              only: Optional[List[str]] = None,
              profile: str = "full") -> Dict:
    os.makedirs(workdir, exist_ok=True)
    os.makedirs(evidence_dir, exist_ok=True)
    data_dir = os.path.join(workdir, "shards")
    cfg = relay_config(width, data_dir)
    if smoke:
        cfg.sample.directions = ("R", "L")
        cfg.sample.num_split = 2
        cfg.sample.num_samples = 2
    s = settings(smoke, width, evidence_dir, profile)

    forced = False
    results = {}
    for stage in STAGES:
        if only and stage not in only:
            continue
        if force_from == stage:
            forced = True
        if _is_done(workdir, stage) and not forced:
            results[stage] = _read_marker(workdir, stage)
            print(f"[relay] {stage}: already done, skipping")
            continue
        if forced:
            _purge_stage_state(workdir, stage)
        print(f"[relay] {stage}: running")
        t0 = time.time()
        summary = STAGE_FNS[stage](cfg, workdir, s) or {}
        summary["seconds"] = time.time() - t0
        _mark_done(workdir, stage, summary)
        results[stage] = summary
        print(f"[relay] {stage}: done in {summary['seconds']:.0f}s -> "
              + json.dumps({k: v for k, v in summary.items()
                            if isinstance(v, (int, float, str))},
                           default=str)[:400])
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="runs/relay")
    ap.add_argument("--evidence", default="evidence/relay")
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--force-from", default=None, choices=STAGES)
    ap.add_argument("--only", default=None,
                    help="comma-separated stage subset")
    ap.add_argument("--profile", default="full",
                    choices=["full", "session", "fast"])
    args = ap.parse_args(argv)
    run_relay(args.workdir, args.evidence, width=args.width, smoke=args.smoke,
              force_from=args.force_from,
              only=args.only.split(",") if args.only else None,
              profile=args.profile)


if __name__ == "__main__":
    main()
