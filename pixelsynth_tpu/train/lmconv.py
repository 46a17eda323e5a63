"""Stage-3 locally-masked PixelCNN training step.

Mirrors train_lmconv.py:662-760: 512-way cross-entropy over the code grid
with per-image kernel-mask triples, Adam + per-step exponential LR decay
(StepLR gamma=0.999995, train_lmconv.py:458), gradient clipping
(clip 4e6 in the scripts), and an optional parameter EMA
(models/lmconv/utils.py:635-653).  bpd = CE / log(2) per position
(train_lmconv.py:705-707).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixelsynth_tpu.models.lmconv import LMPixelCNN


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LMTrainState:
    variables: Dict
    opt: Any
    ema_params: Optional[Dict]
    step: jnp.ndarray


def create_lmconv_state(
    model: LMPixelCNN,
    key: jax.Array,
    *,
    lr: float = 2e-4,
    lr_decay: float = 0.999995,
    clip: float = 4e6,
    ema_decay: Optional[float] = None,
    rows: int = 32,
    cols: int = 32,
) -> Tuple[LMTrainState, Any]:
    oh = jnp.zeros((1, rows, cols, model.input_channels))
    m = jnp.ones((1, model.kernel_size ** 2, rows * cols))
    variables = model.init({"params": key}, oh, m, m, m, train=False)
    schedule = optax.exponential_decay(lr, transition_steps=1, decay_rate=lr_decay)
    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adam(schedule),
    )
    ema = jax.tree.map(jnp.copy, variables["params"]) if ema_decay else None
    state = LMTrainState(dict(variables), tx.init(variables["params"]), ema,
                         jnp.zeros((), jnp.int32))
    return state, tx


def make_lmconv_train_step(
    model: LMPixelCNN, tx, *, ema_decay: Optional[float] = None
) -> Callable:
    """(state, codes (B,H,W) int, masks (B,3,k^2,HW), rng) -> (state, metrics)."""

    nc = model.num_classes

    def step(state: LMTrainState, codes, masks, rng):
        def loss_fn(params):
            variables = {**state.variables, "params": params}
            oh = jax.nn.one_hot(codes, nc)
            logits = model.apply(
                variables, oh, masks[:, 0], masks[:, 1], masks[:, 2],
                train=True, rngs={"dropout": rng},
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            ll = jnp.take_along_axis(logp, codes[..., None], axis=-1)[..., 0]
            return -jnp.mean(ll)

        loss, grads = jax.value_and_grad(loss_fn)(state.variables["params"])
        gnorm = optax.global_norm(grads)
        updates, opt = tx.update(grads, state.opt, state.variables["params"])
        params = optax.apply_updates(state.variables["params"], updates)

        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1 - ema_decay), ema, params
            )

        new_state = LMTrainState(
            variables={**state.variables, "params": params},
            opt=opt,
            ema_params=ema,
            step=state.step + 1,
        )
        metrics = {"ce": loss, "bpd": loss / np.log(2.0), "grad_norm": gnorm}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))
