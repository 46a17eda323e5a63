"""Stage-1 VQ-VAE training step.

Mirrors train_vqvae.py:27-41: MSE reconstruction + 0.25 * latent commitment
loss, Adam(3e-4).  The reference's NCCL DDP (distributed/launch.py:21-91)
and codebook-stat all_reduce (vqvae.py:57-58) are subsumed by pjit over the
mesh data axis: gradients and the EMA sums are computed over the global
batch automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from pixelsynth_tpu.models.vqvae import VQVAETop

LATENT_LOSS_WEIGHT = 0.25  # train_vqvae.py:30


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VQTrainState:
    variables: Dict         # {"params", "ema"}
    opt: Any
    step: jnp.ndarray


def create_vqvae_state(
    model: VQVAETop, key: jax.Array, lr: float = 3e-4, img_size: int = 256,
    init_batch=None,
) -> Tuple[VQTrainState, Any]:
    """init_batch: optional (B, W, W, 3) images for data-dependent codebook
    initialization -- strongly recommended (see init_codebook_from_batch)."""
    variables = model.init(
        {"params": key}, jnp.zeros((1, img_size, img_size, 3)), train=False
    )
    if init_batch is not None:
        variables = init_codebook_from_batch(model, variables,
                                             jnp.asarray(init_batch), key)
    tx = optax.adam(lr)
    return VQTrainState(dict(variables), tx.init(variables["params"]), jnp.zeros((), jnp.int32)), tx


def init_codebook_from_batch(model: VQVAETop, variables, img, key):
    """Initialize the EMA codebooks by sampling encoder outputs.

    The reference (and Sonnet) initialize `embed` ~ N(0, 1)
    (models/vqvae2/vqvae.py:36): at init the encoder's outputs occupy a
    tiny ball near the origin, so a single random code is nearest for
    every position, the EMA then only ever updates that code, and the
    quantizer collapses to one active code (observed: 1/512 codes used
    after 1200 steps; recon MSE pinned at the data variance).  The
    reference escapes this only at large batch x epoch scale.  Sampling
    initial codes from actual pre-quantize latents (+ small jitter to
    separate duplicates) puts every code inside the encoder's output
    distribution, which keeps the codebook live from step one.
    """
    qt, qb = model.apply(variables, img, method=model.pre_quantize)

    def sample_codes(lat, ema, sub):
        flat = lat.reshape(-1, lat.shape[-1])
        n = ema["embed"].shape[1]
        k1, k2 = jax.random.split(sub)
        idx = jax.random.randint(k1, (n,), 0, flat.shape[0])
        centers = flat[idx]
        std = jnp.maximum(jnp.std(flat), 1e-4)
        centers = centers + 0.01 * std * jax.random.normal(
            k2, centers.shape, centers.dtype)
        embed = centers.T  # (dim, n_embed)
        # embed_avg must be a distinct buffer: the train step donates the
        # state, and two donated leaves aliasing one buffer is a runtime
        # error on TPU
        return {"embed": embed, "embed_avg": embed + 0.0,
                "cluster_size": jnp.ones((n,), jnp.float32)}

    k_t, k_b = jax.random.split(jax.random.fold_in(key, 7))
    ema = dict(variables["ema"])
    ema["quantize_t"] = sample_codes(qt, ema["quantize_t"], k_t)
    # recompute qb through the freshly initialized top codebook
    variables = {**variables, "ema": ema}
    _, qb = model.apply(variables, img, method=model.pre_quantize)
    ema = dict(variables["ema"])
    ema["quantize_b"] = sample_codes(qb, ema["quantize_b"], k_b)
    return {**variables, "ema": ema}


def make_vqvae_train_step(model: VQVAETop, tx) -> Callable:
    def step(state: VQTrainState, img: jnp.ndarray):
        def loss_fn(params):
            variables = {**state.variables, "params": params}
            (recon, diff), upd = model.apply(
                variables, img, train=True, mutable=["ema"]
            )
            recon_loss = jnp.mean((recon - img) ** 2)
            loss = recon_loss + LATENT_LOSS_WEIGHT * diff
            return loss, (recon_loss, diff, upd)

        (loss, (recon_loss, diff, upd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.variables["params"])
        updates, opt = tx.update(grads, state.opt, state.variables["params"])
        params = optax.apply_updates(state.variables["params"], updates)
        new_state = VQTrainState(
            variables={**state.variables, "params": params, **upd},
            opt=opt,
            step=state.step + 1,
        )
        metrics = {"loss": loss, "mse": recon_loss, "latent": diff}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))
