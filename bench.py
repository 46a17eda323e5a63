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

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


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

        def logits_fn(cur_codes, filled):
            return model.apply(variables, None, masks_p[:, 0], masks_p[:, 1],
                               masks_p[:, 2], codes=cur_codes, filled=filled,
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
    # reference strategy on the same hardware: one candidate at a time
    t_seq1 = run(1, 1)
    t_sequential = t_seq1 * POP

    steps_per_sec = POP * N_BG / t_batched
    speedup = t_sequential / t_batched

    print(json.dumps({
        "metric": "ar_population_sampling_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": f"codes/sec (pop={POP}, {N_BG} bg cells, 32x32 grid)",
        "vs_baseline": round(speedup, 2),
    }))


if __name__ == "__main__":
    main()
