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
    model: VQVAETop, key: jax.Array, lr: float = 3e-4, img_size: int = 256
) -> Tuple[VQTrainState, Any]:
    variables = model.init(
        {"params": key}, jnp.zeros((1, img_size, img_size, 3)), train=False
    )
    tx = optax.adam(lr)
    return VQTrainState(dict(variables), tx.init(variables["params"]), jnp.zeros((), jnp.int32)), tx


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
