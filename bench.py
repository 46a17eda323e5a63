"""Benchmark: batched AR outpainting throughput on real hardware.

Measures the reference's dominant cost (SURVEY.md section 3.1: sequential
32x32 PixelCNN forwards, one per sampled pixel per candidate,
models/lmconv/sample.py:54-66) in our batched formulation, and reports the
effective AR sampling step rate of the whole candidate population:

  population_steps/sec = (population x loop steps) / wall

vs_baseline compares against the sequential mode measured on the SAME
hardware with the SAME kernels (population 1, candidates looped one at a
time) -- i.e. the reference's sampling strategy ported to this framework;
the ratio isolates the population-batching win.

The "extra" dict carries the per-stage regression guards the round-1
review asked for: splat_ms (soft z-buffer at 2x65536 points, W=256,
counting-sort binning), ar_step_ms (one population PixelCNN forward), and
view_seconds (one full novel view end to end: depth -> reproject -> splat
-> order/masks -> AR outpaint -> decode -> rerank, full-size model,
steady-state).  All timings force a scalar readback per rep
(block_until_ready is unreliable under remote platforms).

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _splat_inputs():
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


def bench_splat():
    from pixelsynth_tpu.config import SplatConfig
    from pixelsynth_tpu.ops.splat import splat

    W, pts, fts, vld = _splat_inputs()
    cfg = SplatConfig()
    f = jax.jit(lambda p, ft, v: splat(p, ft, v, W=W, cfg=cfg)[0].sum())
    float(f(pts, fts, vld))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        float(f(pts, fts, vld))
    return (time.perf_counter() - t0) / reps * 1000


def bench_splat_ingraph(reps: int = 10):
    """Amortized: `reps` splats inside ONE jitted scan, one readback.

    Subtracts the per-dispatch tunnel floor (~24 ms through axon,
    evidence/profile_hotspots_r4.json) that inflates bench_splat; the
    per-step z perturbation depends on the loop carry so XLA cannot
    hoist the splat out of the scan."""
    from jax import lax

    from pixelsynth_tpu.config import SplatConfig
    from pixelsynth_tpu.ops.splat import splat

    W, pts, fts, vld = _splat_inputs()
    cfg = SplatConfig()

    def body(carry, i):
        p = pts.at[..., 2].add(1e-3 * i.astype(jnp.float32) + 1e-6 * carry)
        img, _ = splat(p, fts, vld, W=W, cfg=cfg)
        return carry + img.sum(), None

    f = jax.jit(
        lambda: lax.scan(body, jnp.float32(0.0), jnp.arange(reps))[0])
    float(f())  # compile
    t0 = time.perf_counter()
    float(f())
    return (time.perf_counter() - t0) / reps * 1000


def bench_view_and_scene():
    """view_seconds: one full novel view, steady state.  scene_seconds:
    a full multi-direction cumulative scene walk (R L U D at num_split=8,
    28 views -- the north-star "single image -> full scene" wall-clock,
    BASELINE.md <5 s target), second walk so compile is excluded."""
    import warnings

    from pixelsynth_tpu.demo import demo_cameras, load_model
    from pixelsynth_tpu.geometry.paths import get_rt_from_rot
    from pixelsynth_tpu.pipeline import CloudState
    from pixelsynth_tpu.scene import SceneGenerator

    ps, variables = load_model(None)
    cams = demo_cameras(1.0)
    # pinned protocol: 8 candidate samples per view (the round-1 quoted
    # config), T=0.7 -- keep stable so cross-round deltas are comparable
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # no classifier weights in bench
        gen = SceneGenerator(ps, variables, num_samples=8, temperature=0.7)
    img = jnp.zeros((1, ps.W, ps.W, 3))
    RTinv, RT = get_rt_from_rot("R", cams["P"], scene_mode=False, rotation=0.3)
    view_cams = {"K": cams["K"], "Kinv": cams["Kinv"], "P_in": cams["P"],
                 "Pinv_in": cams["Pinv"], "P_out": np.asarray(RT)}
    rng = jax.random.PRNGKey(0)

    def one(i):
        cloud = CloudState.empty(1, ps.W * ps.W, 3)
        best, _ = gen.generate_view(img, view_cams, cloud, None,
                                    cams["Pinv"], jax.random.fold_in(rng, i))
        return float(jnp.asarray(best).sum())

    one(0)  # compile
    t0 = time.perf_counter()
    one(1)
    one(2)
    view_seconds = (time.perf_counter() - t0) / 2

    dirs = ("R", "L", "U", "D")
    n_views = 9 + 9 + 5 + 5

    def walk(seed):
        gen.generate_scene(img, cams["K"], cams["Kinv"], cams["P"],
                           cams["Pinv"], directions=list(dirs), num_split=8,
                           rng=jax.random.PRNGKey(seed))

    walk(0)  # the scene step is already compiled from the view bench
    t0 = time.perf_counter()
    walk(1)
    scene_seconds = time.perf_counter() - t0
    return view_seconds, scene_seconds, n_views


def main():
    from pixelsynth_tpu.config import Config
    from pixelsynth_tpu.models.lmconv import LMPixelCNN
    from pixelsynth_tpu.ops.orders import custom_order, masks_for_orders_batch
    from pixelsynth_tpu.sampling import ar_sample

    cfg = Config()
    l = cfg.model.lmconv
    H = Wd = l.obs[1]
    NC = l.num_classes
    POP = 16          # candidate population advancing together
    N_BG = 512        # background cells to fill (half the grid)

    model = LMPixelCNN(
        nr_resnet=l.nr_resnet, nr_filters=l.nr_filters, input_channels=NC,
        kernel_size=l.kernel_size, max_dilation=l.max_dilation,
        feature_norm=l.feature_norm, num_classes=NC,
        compute_dtype="bfloat16", backend="pallas",
    )

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    bg = np.zeros((1, H, Wd), np.float32)
    bg[:, :, Wd // 2:] = 1.0  # right half to outpaint
    dist = ((1 - bg) * 3 - bg * 2).astype(np.int32)[0]
    order = custom_order(dist)[None]
    a, b, d = masks_for_orders_batch([order[0]], H, Wd, l.kernel_size, l.max_dilation)
    masks1 = jnp.asarray(np.stack([a, b, d], 1))

    oh = jnp.zeros((1, H, Wd, NC))
    variables = model.init({"params": key}, oh, masks1[:, 0], masks1[:, 1],
                           masks1[:, 2], train=False)
    codes = jnp.asarray(rng.integers(0, NC, (1, H, Wd)), jnp.int32)

    def run(pop: int, n_loops: int):
        codes_p = jnp.repeat(codes, pop, 0)
        order_p = jnp.repeat(jnp.asarray(order), pop, 0)
        bg_p = jnp.repeat(jnp.asarray(bg), pop, 0)
        masks_p = jnp.repeat(masks1, pop, 0)

        # measure the SHIPPED sampling path (config sample_backend),
        # mirroring PixelSynth.make_sampling_logits_fn
        if l.sample_backend == "fused":
            from pixelsynth_tpu.ops.lmconv_fused import make_fused_logits_fn

            logits_fn = make_fused_logits_fn(
                variables, masks_p, nr_resnet=l.nr_resnet,
                max_dilation=l.max_dilation, num_classes=NC,
                compute_dtype=l.compute_dtype,
            )
        else:
            def logits_fn(cur_codes, filled):
                return model.apply(variables, None, masks_p[:, 0],
                                   masks_p[:, 1], masks_p[:, 2],
                                   codes=cur_codes, filled=filled,
                                   train=False)

        # return a scalar so timing forces a real device round trip
        # (block_until_ready is unreliable under remote platforms)
        f = jax.jit(
            lambda k: ar_sample(logits_fn, codes_p, order_p, bg_p, k,
                                num_classes=NC, temperature=0.7).sum()
        )
        int(f(key))  # compile
        t0 = time.perf_counter()
        for i in range(n_loops):
            int(f(jax.random.fold_in(key, i)))
        dt = (time.perf_counter() - t0) / n_loops
        return dt  # seconds per full view fill (N_BG steps) for `pop` candidates

    # batched population: all POP candidates advance per PixelCNN forward
    t_batched = run(POP, 3)
    # reference strategy on the same hardware: one candidate at a time.
    # 3 reps: a single rep made vs_baseline drift 1.41/1.35/1.24/1.73
    # across otherwise-identical runs (the ratio was measurement noise)
    t_seq1 = run(1, 3)
    t_sequential = t_seq1 * POP

    steps_per_sec = POP * N_BG / t_batched
    speedup = t_sequential / t_batched

    extra = {"ar_step_ms": round(t_batched / N_BG * 1000, 3)}

    # exact speculative decoding (sampling.ar_sample_speculative): same
    # joint distribution, 1..spec+1 cells committed per forward
    try:
        from pixelsynth_tpu.sampling import ar_sample_speculative

        codes_p = jnp.repeat(codes, POP, 0)
        order_p = jnp.repeat(jnp.asarray(order), POP, 0)
        bg_p = jnp.repeat(jnp.asarray(bg), POP, 0)
        masks_p = jnp.repeat(masks1, POP, 0)
        from pixelsynth_tpu.ops.lmconv_fused import make_fused_logits_fn

        lf = make_fused_logits_fn(
            variables, masks_p, nr_resnet=l.nr_resnet,
            max_dilation=l.max_dilation, num_classes=NC,
            compute_dtype=l.compute_dtype,
        )
        spec = cfg.sample.speculative or 3
        fs_ = jax.jit(
            lambda k: ar_sample_speculative(
                lf, codes_p, order_p, bg_p, k, num_classes=NC,
                temperature=0.7, spec=spec).sum()
        )
        int(fs_(key))
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            int(fs_(jax.random.fold_in(key, 100 + i)))
        t_spec = (time.perf_counter() - t0) / reps
        _, st = jax.jit(
            lambda k: ar_sample_speculative(
                lf, codes_p, order_p, bg_p, k, num_classes=NC,
                temperature=0.7, spec=spec, return_stats=True)
        )(key)
        extra["spec_cell_ms"] = round(t_spec / N_BG * 1000, 3)
        extra["spec_cells_per_forward"] = round(
            float(st["max_n_bg"]) / float(st["n_forwards"]), 2)
        # the SHIPPED path (population-batched + speculative, the
        # config default) vs the reference's sampling strategy (one
        # candidate at a time, one cell per forward) on this hardware.
        # vs_baseline above deliberately isolates population batching
        # alone and is kept semantically stable across rounds.
        extra["shipped_speedup_vs_sequential"] = round(
            t_sequential / t_spec, 2)
    except Exception as e:
        extra["spec_cell_ms"] = f"failed: {e}"
    try:
        extra["splat_ms"] = round(bench_splat(), 2)
    except Exception as e:  # never lose the headline metric
        extra["splat_ms"] = f"failed: {e}"
    try:
        extra["splat_ms_ingraph"] = round(bench_splat_ingraph(), 2)
    except Exception as e:
        extra["splat_ms_ingraph"] = f"failed: {e}"
    try:
        view_s, scene_s, n_views = bench_view_and_scene()
        extra["view_seconds"] = round(view_s, 2)
        extra["scene_seconds"] = round(scene_s, 2)
        extra["scene_views"] = n_views
    except Exception as e:
        extra["view_seconds"] = f"failed: {e}"

    print(json.dumps({
        "metric": "ar_population_sampling_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": f"codes/sec (pop={POP}, {N_BG} bg cells, 32x32 grid)",
        "vs_baseline": round(speedup, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
