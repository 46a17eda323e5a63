"""Stage-2 (depth + projection + refinement [+ AR head]) training step.

Functional re-design of the reference's BaseModel G/D alternation
(models/base_model.py:81-148) + train_dpr.py: one jitted step performs the
generator update (synthesis + perceptual + AR cross-entropy + GAN hinge +
feature matching) followed by the discriminator update on the detached
prediction, with Adam(lr/2, (0, .9)) for G and Adam(lr*2, (0, .9)) for D
(base_model.py:23-33, gan_loss.py:245-249).

The VQ-VAE and VGG trees are frozen inputs (train_dpr.py:422-434).  Under
pjit with the batch sharded over the mesh data axis, gradient averaging and
BatchNorm statistics are global automatically -- the step body contains no
collective calls.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from pixelsynth_tpu.models.losses import (
    discriminator_scores,
    hinge_d_loss,
    hinge_g_loss,
)
from pixelsynth_tpu.pipeline import PixelSynth

TRAINABLE = ("unet", "projector", "pixelcnn", "encoder")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DPRTrainState:
    gen_vars: Dict          # trainable trees (params + stats collections)
    disc_vars: Dict
    frozen_vars: Dict       # {"vqvae", "vgg"}
    opt_g: Any
    opt_d: Any
    step: jnp.ndarray


def split_gen_vars(variables: Dict) -> Tuple[Dict, Dict, Dict]:
    gen = {k: variables[k] for k in TRAINABLE if k in variables}
    disc = variables["disc"]
    frozen = {k: variables[k] for k in ("vqvae", "vgg")}
    return gen, disc, frozen


def _params_of(tree_of_vars: Dict) -> Dict:
    return {k: v["params"] for k, v in tree_of_vars.items()}


def _with_params(tree_of_vars: Dict, params: Dict) -> Dict:
    return {
        k: {**v, "params": params[k]} for k, v in tree_of_vars.items()
    }


def _merge_updates(tree_of_vars: Dict, updates: Dict) -> Dict:
    out = dict(tree_of_vars)
    for k, upd in updates.items():
        if upd:
            out[k] = {**out[k], **upd}
    return out


def create_dpr_state(
    ps: PixelSynth, variables: Dict, *, steps_per_epoch: int = 500
) -> Tuple[DPRTrainState, Any, Any]:
    cfg = ps.cfg.train
    gen, disc, frozen = split_gen_vars(variables)
    if cfg.niter is not None:
        # linear decay to 0 over niter_decay epochs after niter epochs
        # (discriminators.py update_learning_rate; G keeps lr/2, D lr*2)
        def sched(peak):
            return optax.schedules.join_schedules(
                [optax.constant_schedule(peak),
                 optax.linear_schedule(peak, 0.0,
                                       cfg.niter_decay * steps_per_epoch)],
                [cfg.niter * steps_per_epoch],
            )

        tx_g = optax.adam(sched(cfg.lr_g), b1=cfg.beta1, b2=cfg.beta2)
        tx_d = optax.adam(sched(cfg.lr_d), b1=cfg.beta1, b2=cfg.beta2)
    else:
        tx_g = optax.adam(cfg.lr_g, b1=cfg.beta1, b2=cfg.beta2)
        tx_d = optax.adam(cfg.lr_d, b1=cfg.beta1, b2=cfg.beta2)
    if cfg.num_accumulations > 1:
        # microbatch gradient accumulation (base_model.py:92-129 semantics)
        tx_g = optax.MultiSteps(tx_g, cfg.num_accumulations)
        tx_d = optax.MultiSteps(tx_d, cfg.num_accumulations)
    state = DPRTrainState(
        gen_vars=gen,
        disc_vars=disc,
        frozen_vars=frozen,
        opt_g=tx_g.init(_params_of(gen)),
        opt_d=tx_d.init(disc["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return state, tx_g, tx_d


def make_dpr_train_step(
    ps: PixelSynth, tx_g, tx_d, *, train_ar: bool = True, donate: bool = False
) -> Callable:
    """Build the jitted G+D train step: (state, batch, rng) -> (state, metrics)."""

    def disc_apply_fn(disc_vars):
        def apply(x, train=True):
            out = ps.disc.apply(
                disc_vars, x, train=train,
                mutable=["spectral_stats"] if train else False,
            )
            return out[0] if train else out

        return apply

    def step(state: DPRTrainState, batch: Dict, rng: jax.Array):
        rng_noise, rng_next = jax.random.split(rng)
        rngs = {"noise": rng_noise}

        # ---- generator step ----
        def g_loss_fn(gen_params):
            gen_vars = _with_params(state.gen_vars, gen_params)
            total, (losses, outputs, updates) = ps.train_forward(
                gen_vars, state.frozen_vars, batch, rngs, train_ar=train_ar
            )
            pred, gt = outputs["PredImg"], outputs["OutputImg"]
            pf, pr = discriminator_scores(
                disc_apply_fn(state.disc_vars), pred, gt, train=False
            )
            g_losses = hinge_g_loss(
                pf, pr, lambda_feat=ps.cfg.loss.lambda_feat,
                feat_match=not ps.cfg.loss.no_ganFeat_loss,
            )
            total = total + g_losses["Total Loss"]
            losses.update({k: v for k, v in g_losses.items() if k != "Total Loss"})
            return total, (losses, outputs, updates)

        gen_params = _params_of(state.gen_vars)
        (g_total, (losses, outputs, updates)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(gen_params)
        g_updates, opt_g = tx_g.update(grads, state.opt_g, gen_params)
        gen_params = optax.apply_updates(gen_params, g_updates)
        gen_vars = _with_params(_merge_updates(state.gen_vars, updates), gen_params)

        # ---- discriminator step (detached prediction) ----
        pred = jax.lax.stop_gradient(outputs["PredImg"])
        gt = outputs["OutputImg"]

        def d_loss_fn(disc_params):
            disc_vars = {**state.disc_vars, "params": disc_params}
            pf, pr = discriminator_scores(disc_apply_fn(disc_vars), pred, gt,
                                          train=False)
            d_losses = hinge_d_loss(pf, pr)
            return d_losses["Total Loss"], d_losses

        (d_total, d_losses), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.disc_vars["params"])
        d_updates, opt_d = tx_d.update(d_grads, state.opt_d, state.disc_vars["params"])
        disc_params = optax.apply_updates(state.disc_vars["params"], d_updates)
        disc_vars = {**state.disc_vars, "params": disc_params}

        # advance discriminator spectral power iterations once per step
        _, disc_upd = ps.disc.apply(
            disc_vars, jnp.concatenate([pred, gt], 0), train=True,
            mutable=["spectral_stats"],
        )
        disc_vars = {**disc_vars, **disc_upd}

        metrics = {k: v for k, v in losses.items()}
        metrics.update({k: v for k, v in d_losses.items() if k != "Total Loss"})
        metrics["G_total"] = g_total
        metrics["D_total"] = d_total

        new_state = DPRTrainState(
            gen_vars=gen_vars,
            disc_vars=disc_vars,
            frozen_vars=state.frozen_vars,
            opt_g=opt_g,
            opt_d=opt_d,
            step=state.step + 1,
        )
        return new_state, metrics, rng_next

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_dpr_eval_step(ps: PixelSynth, *, train_ar: bool = True,
                       noise_scale: float = 1.0) -> Callable:
    """Validation forward (train_dpr.py:164-218 val path): same losses
    (incl. PSNR used for best-checkpoint selection), no parameter or
    statistics updates.

    noise_scale=0.0 evaluates deterministically (NoiseBN gain=1/bias=0);
    the reference redraws BN-conditioning noise at every eval forward
    (normalization.py:21-47), which caps PSNR against a fixed target."""

    def step(state: DPRTrainState, batch: Dict, rng: jax.Array):
        rngs = {"noise": rng}
        _, (losses, outputs, _) = ps.train_forward(
            state.gen_vars, state.frozen_vars, batch, rngs,
            train_ar=train_ar, train=False, noise_scale=noise_scale,
        )
        return losses

    return jax.jit(step)
