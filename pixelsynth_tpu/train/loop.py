"""Host-side training drivers for the three stages.

Mirrors the reference entry points:
  * run_dpr  <- train_dpr.py:91-333 (G/D epochs, 500 it/epoch, rotation
    curriculum +10 deg every 50 epochs, best-by-PSNR + rolling + periodic
    checkpoints, preemption-safe resume);
  * run_vqvae <- train_vqvae.py (MSE + 0.25 latent);
  * run_lmconv <- train_lmconv.py:662-839 (CE/bpd, mask pool built from the
    first mask_pool_batches batches' orders and randomly reassigned).

Preemption: SIGTERM/SIGINT set a flag; the loop checkpoints and exits
cleanly (the orbax-era replacement for the SLURM SIGUSR1 + scontrol
requeue handler, train_dpr.py:32-88)."""

from __future__ import annotations

import os
import signal
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pixelsynth_tpu.checkpoint import CheckpointManager
from pixelsynth_tpu.config import Config
from pixelsynth_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from pixelsynth_tpu.pipeline import PixelSynth
from pixelsynth_tpu.train.dpr import (
    create_dpr_state,
    make_dpr_eval_step,
    make_dpr_train_step,
)


class MetricsLogger:
    """JSONL metrics stream (replaces the reference's tensorboardX scalar
    streams, train_dpr.py:154-159 -- grep-able, no extra deps)."""

    def __init__(self, workdir: str, name: str):
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, f"{name}_metrics.jsonl")

    def write(self, step: int, metrics: Dict[str, float], **extra):
        import json

        rec = {"step": step, **{k: float(v) for k, v in metrics.items()},
               **extra, "time": time.time()}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


class PreemptionGuard:
    def __init__(self):
        self.requested = False
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, self._handler)
            except ValueError:
                pass  # not the main thread

    def _handler(self, signum, frame):
        self.requested = True


def make_batch_source(cfg: Config, split: str = "train") -> Callable[[], Dict]:
    """Dataset factory (the reference's options/options.py:21-113)."""
    if cfg.dataset == "synthetic":
        # disjoint streams per split so validation never sees train batches
        rng = np.random.default_rng(cfg.train.seed + (10_000 if split != "train" else 0))

        def fn():
            from pixelsynth_tpu.data.synthetic import synthetic_pair_batch

            return synthetic_pair_batch(rng, cfg.train.batch_size, cfg.model.W)

        fn.split = split
        return fn
    if cfg.dataset == "realestate":
        from pixelsynth_tpu.data.realestate10k import RealEstate10K

        ds = RealEstate10K(
            split, data_path=cfg.train_data_path, W=cfg.model.W,
            max_rotation=cfg.train.max_rotation, seed=cfg.train.seed,
        )

        def fn():
            return ds.batch(cfg.train.batch_size)

        fn.dataset = ds  # curriculum hook
        fn.split = split
        return fn
    if cfg.dataset in ("mp3d", "replica", "habitat"):
        from pixelsynth_tpu.data.habitat import PreRenderedEpisodes

        gen = PreRenderedEpisodes(
            cfg.train_data_path,
            seed=cfg.train.seed + (10_000 if split != "train" else 0),
            split=split,  # val_*.npz shards are a true held-out split
        )

        def fn():
            return gen.batch(cfg.train.batch_size)

        fn.split = split
        return fn
    if cfg.dataset == "habitat_live":
        # live simulator bridge (the reference's 5-process VectorEnv path,
        # create_rgb_dataset.py:110): train_data_path is a habitat scenes
        # config, or "panorama" for the procedural world backend
        from pixelsynth_tpu.data.habitat_bridge import (
            HabitatLivePairGenerator,
            PanoramaGenerator,
            VectorGeneratorBridge,
        )

        seed = cfg.train.seed + (10_000 if split != "train" else 0)
        if cfg.train_data_path in ("", "panorama"):
            factory = PanoramaGenerator(W=cfg.model.W,
                                        max_rotation=cfg.train.max_rotation)
        else:
            factory = HabitatLivePairGenerator(
                cfg.train_data_path, max_rotation=cfg.train.max_rotation)
        bridge = VectorGeneratorBridge(factory, num_workers=5, seed=seed)

        def fn():
            return bridge.batch(cfg.train.batch_size)

        fn.split = split
        fn.bridge = bridge  # callers may close() it
        return fn
    if cfg.dataset == "custom":
        from pixelsynth_tpu.data.custom import Custom, collate

        ds = Custom(cfg.train_data_path, W=cfg.model.W)
        rng = np.random.default_rng(cfg.train.seed)

        def fn():
            idx = rng.integers(len(ds), size=cfg.train.batch_size)
            return collate([ds[int(i)] for i in idx])

        return fn
    raise ValueError(f"unknown dataset {cfg.dataset}")


def run_dpr(
    cfg: Config,
    workdir: str,
    *,
    epochs: Optional[int] = None,
    iters_per_epoch: Optional[int] = None,
    val_iters: Optional[int] = None,
    use_mesh: bool = True,
    log_fn: Callable[[str], None] = print,
    train_ar: bool = True,
    init_vars: Optional[Dict] = None,
) -> Dict[str, float]:
    """Stage-2 training driver.  Returns the last metrics dict.

    Validation draws from the *val* split (RealEstate: last 20% of the
    train video list, mirroring toval at data/realestate10k.py:298-310;
    synthetic: a disjoint stream) over cfg.train.val_iters batches
    (reference: 50, train_dpr.py:170), and best-by-PSNR checkpoint
    selection keys off that val PSNR (train_dpr.py:316-322).

    train_ar=False is the reference's --pretrain mode (no AR head loss,
    train_dpr.py:436; used before generation orders exist).  init_vars
    overrides initial variable trees by name -- the relay's stage chaining
    (frozen trained "vqvae" per train_dpr.py:422-434, stage-3 "pixelcnn"
    per demo.py:198-243, or a pretrain checkpoint's trees)."""
    guard = PreemptionGuard()
    ps = PixelSynth(cfg)
    key = jax.random.PRNGKey(cfg.train.seed)
    variables = ps.init_variables(key)
    if init_vars:
        unknown = set(init_vars) - set(variables)
        if unknown:
            raise KeyError(f"init_vars has unknown trees: {sorted(unknown)}")
        variables = {**variables, **init_vars}
    state, tx_g, tx_d = create_dpr_state(ps, variables)
    step_fn = make_dpr_train_step(ps, tx_g, tx_d, train_ar=train_ar)
    eval_fn = make_dpr_eval_step(ps, train_ar=train_ar)
    logger = MetricsLogger(workdir, "dpr")

    ckpt = CheckpointManager(
        os.path.join(workdir, "dpr"), max_to_keep=3,
        best_metric="psnr", best_mode="max", keep_period=50,
    )
    start_epoch = 0
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        start_epoch = int(ckpt.latest_step())
        log_fn(f"resumed from epoch {start_epoch}")

    mesh = make_mesh(cfg.mesh) if use_mesh else None
    if mesh is not None:
        state = replicate(state, mesh)

    batch_fn = make_batch_source(cfg, "train")
    val_batch_fn = make_batch_source(cfg, "val")
    epochs = epochs if epochs is not None else cfg.train.max_epoch
    iters = iters_per_epoch if iters_per_epoch is not None else cfg.train.iters_per_epoch
    n_val = val_iters if val_iters is not None else cfg.train.val_iters
    rng = jax.random.PRNGKey(cfg.train.seed + 1)
    metrics: Dict[str, float] = {}
    m: Dict = {}

    for epoch in range(start_epoch, epochs):
        # rotation curriculum (train_dpr.py:91-98)
        tc = cfg.train
        rot = min(tc.max_rotation + (epoch // tc.curriculum_every) * tc.curriculum_step,
                  tc.curriculum_max)
        if hasattr(batch_fn, "dataset"):
            batch_fn.dataset.set_max_rotation(rot)

        t0 = time.time()
        for it in range(iters):
            batch = batch_fn()
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, m, rng = step_fn(state, batch, rng)
            if guard.requested:
                break
        metrics = {k: float(v) for k, v in m.items()}

        # validation pass on the val split: best-by-PSNR selection
        # (train_dpr.py:164-218,316-322; 50 val batches per epoch at :170)
        val_psnrs = []
        for _ in range(max(1, n_val)):
            vbatch = val_batch_fn()
            if mesh is not None:
                vbatch = shard_batch(vbatch, mesh)
            rng, sub = jax.random.split(rng)
            vlosses = eval_fn(state, vbatch, sub)
            val_psnrs.append(float(vlosses["psnr"]))
            if guard.requested:
                break
        metrics["psnr"] = float(np.mean(val_psnrs))

        log_fn(
            f"epoch {epoch} rot {rot} "
            + " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
            + f" ({time.time() - t0:.1f}s)"
        )
        logger.write(epoch + 1, metrics, rot=rot)
        ckpt.save(epoch + 1, jax.device_get(state), cfg, metrics)
        if guard.requested:
            log_fn("preemption requested; checkpointed and exiting")
            break
    ckpt.close()
    return metrics


def run_vqvae(
    cfg: Config, workdir: str, *, epochs: int = 1, iters_per_epoch: int = 100,
    lr: float = 3e-4, val_iters: int = 8, sample_grid_every: int = 1,
    use_mesh: bool = True, log_fn=print,
) -> Dict[str, float]:
    """Stage-1 driver (train_vqvae.py).

    Per epoch: a held-out val MSE pass (the reference all_gathers val MSE
    stats, train_vqvae.py:50-55) keys best-checkpoint selection, and a
    input|recon sample grid is written (the per-100-iter grids at
    train_vqvae.py:68-84)."""
    from pixelsynth_tpu.models.vqvae import VQVAETop
    from pixelsynth_tpu.train.vqvae import create_vqvae_state, make_vqvae_train_step

    guard = PreemptionGuard()
    v = cfg.model.vqvae
    model = VQVAETop(
        in_channel=v.in_channel, channel=v.channel, n_res_block=v.n_res_block,
        n_res_channel=v.n_res_channel, embed_dim=v.embed_dim,
        n_embed=v.n_embed, decay=v.decay,
    )
    init_fn = make_batch_source(cfg, "train")
    state, tx = create_vqvae_state(
        model, jax.random.PRNGKey(cfg.train.seed), lr=lr, img_size=cfg.model.W,
        init_batch=init_fn()["input_img"],  # data-dependent codebook init
    )
    step_fn = make_vqvae_train_step(model, tx)

    @jax.jit
    def recon_fn(variables, img):
        recon, _ = model.apply(variables, img, train=False)
        return recon

    ckpt = CheckpointManager(os.path.join(workdir, "vqvae"), max_to_keep=2,
                             best_metric="val_mse", best_mode="min")
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
    logger = MetricsLogger(workdir, "vqvae")

    mesh = make_mesh(cfg.mesh) if use_mesh else None
    if mesh is not None:
        state = replicate(state, mesh)
    batch_fn = make_batch_source(cfg, "train")
    val_batch_fn = make_batch_source(cfg, "val")
    metrics = {}
    m: Dict = {}
    for epoch in range(epochs):
        for it in range(iters_per_epoch):
            img = batch_fn()["input_img"]
            if mesh is not None:
                img = shard_batch(img, mesh)
            state, m = step_fn(state, jnp.asarray(img))
            if guard.requested:
                break
        metrics = {k: float(v) for k, v in m.items()}

        # held-out val MSE -> best-checkpoint selection
        val_mses = []
        vimg = None
        for _ in range(max(1, val_iters)):
            vimg = jnp.asarray(val_batch_fn()["input_img"])
            if mesh is not None:
                vimg = shard_batch(vimg, mesh)
            recon = recon_fn(state.variables, vimg)
            val_mses.append(float(jnp.mean((recon - vimg) ** 2)))
            if guard.requested:
                break
        metrics["val_mse"] = float(np.mean(val_mses))

        if sample_grid_every and (epoch + 1) % sample_grid_every == 0:
            # input row | recon row strip (train_vqvae.py:68-84)
            from pixelsynth_tpu.eval.harness import save_png

            n = min(8, vimg.shape[0])
            recon = np.asarray(recon_fn(state.variables, vimg[:n]))
            top = np.concatenate(list(np.asarray(vimg[:n])), axis=1)
            bot = np.concatenate(list(np.clip(recon, -1, 1)), axis=1)
            save_png(os.path.join(workdir, "vqvae_samples",
                                  f"epoch_{epoch + 1:04d}.png"),
                     np.concatenate([top, bot], axis=0))

        log_fn(f"vqvae epoch {epoch} " +
               " ".join(f"{k}={v:.5f}" for k, v in metrics.items()))
        logger.write(epoch + 1, metrics)
        ckpt.save(epoch + 1, jax.device_get(state), cfg, metrics)
        if guard.requested:
            break
    ckpt.close()
    return metrics


def lmconv_sample_preview(
    cfg: Config,
    lm_variables: Dict,
    vq_variables: Optional[Dict],
    codes: np.ndarray,
    order: np.ndarray,
    out_path: str,
    *,
    frac: float = 0.6,
    temperature: float = 1.0,
    rng=None,
):
    """Periodic inpainting preview (train_lmconv.py:812-834): keep the
    first `frac` of each image's generation order, resample the rest, and
    write a decoded grid PNG (raw code indices as grayscale when no VQ-VAE
    is supplied)."""
    import jax
    import jax.numpy as jnp

    from pixelsynth_tpu.eval.harness import save_png
    from pixelsynth_tpu.models.lmconv import LMPixelCNN
    from pixelsynth_tpu.ops.orders import masks_for_orders_batch
    from pixelsynth_tpu.ops.orders_jax import rank_from_flat_order
    from pixelsynth_tpu.sampling import ar_sample

    l = cfg.model.lmconv
    rows, cols = l.obs[1], l.obs[2]
    B = codes.shape[0]
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    model = LMPixelCNN(
        nr_resnet=l.nr_resnet, nr_filters=l.nr_filters,
        input_channels=l.input_channels, kernel_size=l.kernel_size,
        max_dilation=l.max_dilation, feature_norm=l.feature_norm,
        num_classes=l.num_classes, compute_dtype=l.compute_dtype,
        backend=l.sample_backend,
    )
    a, b, d = masks_for_orders_batch(list(order), rows, cols,
                                     l.kernel_size, l.max_dilation)
    masks = jnp.asarray(np.stack([a, b, d], 1))
    # "background" = the last (1-frac) of the order
    cut = int(frac * rows * cols)
    flat = order[:, :, 0] * cols + order[:, :, 1]
    rank = np.asarray(rank_from_flat_order(jnp.asarray(flat)[:, :], rows * cols))
    bg = (rank >= cut).astype(np.float32).reshape(B, rows, cols)

    def logits_fn(c, f):
        return model.apply(lm_variables, None, masks[:, 0], masks[:, 1],
                           masks[:, 2], codes=c, filled=f, train=False)

    sampled = ar_sample(logits_fn, jnp.asarray(codes, jnp.int32),
                        jnp.asarray(order), jnp.asarray(bg), rng,
                        num_classes=l.num_classes, temperature=temperature)
    if vq_variables is not None:
        from pixelsynth_tpu.models.vqvae import VQVAETop

        v = cfg.model.vqvae
        vq = VQVAETop(in_channel=v.in_channel, channel=v.channel,
                      n_res_block=v.n_res_block, n_res_channel=v.n_res_channel,
                      embed_dim=v.embed_dim, n_embed=v.n_embed)
        imgs = np.asarray(vq.apply(vq_variables, sampled,
                                   method=vq.decode_code))
        grid = np.concatenate(list(imgs), axis=1)  # side-by-side strip
        save_png(out_path, grid)
    else:
        gray = np.asarray(sampled, np.float32) / (l.num_classes - 1)
        grid = np.concatenate(list(gray), axis=1)
        save_png(out_path, np.stack([grid] * 3, -1))
    return np.asarray(sampled)


def run_lmconv(
    cfg: Config, workdir: str, *, epochs: int = 1, iters_per_epoch: int = 100,
    codes_path: Optional[str] = None, orders_path: Optional[str] = None,
    mask_pool_batches: int = 5, val_fraction: float = 0.05,
    val_iters: int = 8, preview_every: int = 0,
    vq_variables: Optional[Dict] = None, use_mesh: bool = True, log_fn=print,
) -> Dict[str, float]:
    """Stage-3 driver (train_lmconv.py:662-839).

    codes_path: .npy of (N, 32, 32) int codes (extract_code output);
    orders_path: .npy of (M, 1024, 2) generation orders
    (extract_pixcnn_orders output).  Without paths, synthesizes random
    codes/orders (smoke mode).

    Reference-parity features: parameter EMA via cfg.model.lmconv.ema_decay
    (train_lmconv.py:733, utils.py:635-653; the EMA tree is checkpointed and
    preferred at stitch time), a held-out-codes val bpd pass per epoch
    keying best-checkpoint selection (test() at train_lmconv.py:765-791),
    and periodic inpainting sample previews decoded through a frozen VQ-VAE
    when `vq_variables` is given (train_lmconv.py:812-834)."""
    from pixelsynth_tpu.models.lmconv import LMPixelCNN
    from pixelsynth_tpu.ops.orders import masks_for_orders_batch
    from pixelsynth_tpu.train.lmconv import create_lmconv_state, make_lmconv_train_step

    guard = PreemptionGuard()
    l = cfg.model.lmconv
    rows, cols = l.obs[1], l.obs[2]
    model = LMPixelCNN(
        nr_resnet=l.nr_resnet, nr_filters=l.nr_filters,
        input_channels=l.input_channels, kernel_size=l.kernel_size,
        max_dilation=l.max_dilation, feature_norm=l.feature_norm,
        dropout_prob=l.dropout_prob, num_classes=l.num_classes,
    )
    state, tx = create_lmconv_state(
        model, jax.random.PRNGKey(cfg.train.seed), rows=rows, cols=cols,
        ema_decay=l.ema_decay,
    )
    step_fn = make_lmconv_train_step(model, tx, ema_decay=l.ema_decay)

    @jax.jit
    def val_ce(variables, codes, masks):
        oh = jax.nn.one_hot(codes, l.num_classes)
        logits = model.apply(variables, oh, masks[:, 0], masks[:, 1],
                             masks[:, 2], train=False)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, codes[..., None], axis=-1)[..., 0]
        return -jnp.mean(ll)

    ckpt = CheckpointManager(os.path.join(workdir, "lmconv"), max_to_keep=2,
                             best_metric="val_bpd", best_mode="min")
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
    logger = MetricsLogger(workdir, "lmconv")

    rng = np.random.default_rng(cfg.train.seed)
    if codes_path:
        codes_all = np.load(codes_path)
    else:
        codes_all = rng.integers(0, l.num_classes, (256, rows, cols))
    if orders_path:
        orders_all = np.load(orders_path)
    else:
        from pixelsynth_tpu.ops.orders import raster_scan_order, augment_orders

        orders_all = np.stack(augment_orders(raster_scan_order(rows, cols),
                                             rows, cols))

    # held-out tail split for the per-epoch val bpd pass
    n_val = max(cfg.train.batch_size,
                int(len(codes_all) * val_fraction)) if len(codes_all) > 2 * cfg.train.batch_size else 0
    codes_val = codes_all[len(codes_all) - n_val:] if n_val else codes_all
    codes_all = codes_all[: len(codes_all) - n_val] if n_val else codes_all

    # mask pool: masks of the first mask_pool_batches x batch orders,
    # randomly reassigned per image (train_lmconv.py:675-701)
    pool_orders = orders_all[: mask_pool_batches * cfg.train.batch_size]
    a, b, d = masks_for_orders_batch(list(pool_orders), rows, cols,
                                     l.kernel_size, l.max_dilation)
    mask_pool = np.stack([a, b, d], axis=1)  # (P, 3, k2, HW)

    mesh = make_mesh(cfg.mesh) if use_mesh else None
    if mesh is not None:
        state = replicate(state, mesh)

    key = jax.random.PRNGKey(cfg.train.seed + 2)
    metrics = {}
    m: Dict = {}
    for epoch in range(epochs):
        for it in range(iters_per_epoch):
            bidx = rng.integers(len(codes_all), size=cfg.train.batch_size)
            midx = rng.integers(len(mask_pool), size=cfg.train.batch_size)
            codes = jnp.asarray(codes_all[bidx], jnp.int32)
            masks = jnp.asarray(mask_pool[midx], jnp.float32)
            if mesh is not None:
                codes = shard_batch(codes, mesh)
                masks = shard_batch(masks, mesh)
            key, sub = jax.random.split(key)
            state, m = step_fn(state, codes, masks, sub)
            if guard.requested:
                break
        metrics = {k: float(v) for k, v in m.items()}

        # val bpd over the held-out codes with random pool masks
        # (train_lmconv.py:765-791); EMA params when enabled, matching the
        # reference's sampling-time parameter choice
        val_vars = state.variables
        if state.ema_params is not None:
            val_vars = {**state.variables, "params": state.ema_params}
        ces = []
        for _ in range(max(1, val_iters)):
            bidx = rng.integers(len(codes_val), size=cfg.train.batch_size)
            midx = rng.integers(len(mask_pool), size=cfg.train.batch_size)
            ces.append(float(val_ce(
                val_vars, jnp.asarray(codes_val[bidx], jnp.int32),
                jnp.asarray(mask_pool[midx], jnp.float32))))
            if guard.requested:
                break
        metrics["val_bpd"] = float(np.mean(ces) / np.log(2.0))

        if preview_every and (epoch + 1) % preview_every == 0:
            pidx = rng.integers(len(orders_all), size=min(4, len(codes_val)))
            lmconv_sample_preview(
                cfg, val_vars, vq_variables,
                codes_val[: len(pidx)], orders_all[pidx],
                os.path.join(workdir, "lmconv_samples",
                             f"epoch_{epoch + 1:04d}.png"),
                rng=jax.random.fold_in(key, epoch),
            )

        log_fn(f"lmconv epoch {epoch} " +
               " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
        logger.write(epoch + 1, metrics)
        ckpt.save(epoch + 1, jax.device_get(state), cfg, metrics)
        if guard.requested:
            break
    ckpt.close()
    return metrics
