"""Learning-rate schedules.

Mirrors models/vqvae2/scheduler.py (CycleScheduler 1cycle with momentum,
cosine/power/sine/linear/step anneals) on top of optax schedules -- the
reference hand-rolls ~350 lines of phase logic; optax's primitives cover
all of it."""

from __future__ import annotations

import optax


def cycle_schedule(lr: float, n_iter: int, *, warmup_frac: float = 0.3,
                   final_div: float = 25.0) -> optax.Schedule:
    """1cycle (CycleScheduler, scheduler.py): warmup to lr then anneal."""
    return optax.linear_onecycle_schedule(
        transition_steps=n_iter, peak_value=lr,
        pct_start=warmup_frac, pct_final=0.85,
        div_factor=final_div, final_div_factor=final_div,
    )


def step_schedule(lr: float, gamma: float = 0.999995) -> optax.Schedule:
    """Per-step exponential decay (the lmconv StepLR, train_lmconv.py:458)."""
    return optax.exponential_decay(lr, transition_steps=1, decay_rate=gamma)


def cosine_schedule(lr: float, n_iter: int, lr_min: float = 0.0) -> optax.Schedule:
    return optax.cosine_decay_schedule(lr, n_iter, alpha=lr_min / max(lr, 1e-12))


def linear_schedule(lr: float, n_iter: int, lr_min: float = 0.0) -> optax.Schedule:
    return optax.linear_schedule(lr, lr_min, n_iter)


def power_schedule(lr: float, n_iter: int, power: float = 0.9) -> optax.Schedule:
    return optax.polynomial_schedule(lr, 0.0, power, n_iter)


def get_schedule(name: str, lr: float, n_iter: int) -> optax.Schedule:
    return {
        "cycle": lambda: cycle_schedule(lr, n_iter),
        "step": lambda: step_schedule(lr),
        "cosine": lambda: cosine_schedule(lr, n_iter),
        "linear": lambda: linear_schedule(lr, n_iter),
        "power": lambda: power_schedule(lr, n_iter),
        "constant": lambda: optax.constant_schedule(lr),
    }[name]()
