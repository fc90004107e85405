"""Learning-rate schedules as pure step->value functions.

The reference uses stateful torch schedulers; under jit a schedule must be a
pure function of the step counter, so each is reimplemented closed-form:

- OneCycleLR (train.py:103-104): torch defaults pct_start=0.3,
  anneal_strategy='cos', div_factor=25, final_div_factor=1e4,
  cycle_momentum=True with beta1 cycling 0.95 -> 0.85 -> 0.95 (this is why
  train.py:143 logs Beta1). Reproduced exactly, including the
  `float(pct_start*total) - 1` phase boundaries.
- WarmUpLR (lr_scheduler/WarmUpLR.py:4-19): lr * step / (total + 1e-8).
- MultiStepLR (legacy/train_tpu.py:93-97): gamma^(#milestones passed),
  in epochs.
- ExponentialLR sweep (lr_scheduler/ExponentialLR.py:4-24): geometric
  interpolation start->end for the LR range finder.

All functions take a (traced) integer step and return a float32 scalar, so
they compile into the fused update — no host round-trip per step.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

Schedule = Callable[[jax.Array], jax.Array]


def _cos_anneal(start: float, end: float, pct: jax.Array) -> jax.Array:
    return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))


def _onecycle(step: jax.Array, total_steps: int, start1: float, mid: float,
              end2: float, pct_start: float) -> jax.Array:
    """Two-phase cosine onecycle over value start1 -> mid -> end2,
    reproducing torch's phase arithmetic."""
    step = jnp.asarray(step, jnp.float32)
    up_end = float(pct_start * total_steps) - 1.0
    down_end = float(total_steps - 1)
    pct_up = jnp.clip(step / jnp.maximum(up_end, 1e-8), 0.0, 1.0)
    pct_down = jnp.clip((step - up_end) / jnp.maximum(down_end - up_end,
                                                      1e-8), 0.0, 1.0)
    return jnp.where(step <= up_end,
                     _cos_anneal(start1, mid, pct_up),
                     _cos_anneal(mid, end2, pct_down)).astype(jnp.float32)


def onecycle_lr(max_lr: float, total_steps: int, pct_start: float = 0.3,
                div_factor: float = 25.0,
                final_div_factor: float = 1e4) -> Schedule:
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    return lambda step: _onecycle(step, total_steps, initial_lr, max_lr,
                                  min_lr, pct_start)


def onecycle_beta1(total_steps: int, pct_start: float = 0.3,
                   max_momentum: float = 0.95,
                   base_momentum: float = 0.85) -> Schedule:
    """Momentum (Adam beta1) cycles opposite to lr: 0.95 -> 0.85 -> 0.95."""
    return lambda step: _onecycle(step, total_steps, max_momentum,
                                  base_momentum, max_momentum, pct_start)


def warmup_lr(base_lr: float, total_iters: int) -> Schedule:
    return lambda step: jnp.asarray(
        base_lr * jnp.asarray(step, jnp.float32) / (total_iters + 1e-8),
        jnp.float32)


def multistep_lr(base_lr: float, milestones: Sequence[int],
                 gamma: float = 0.1) -> Schedule:
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def fn(epoch):
        n = jnp.sum(jnp.asarray(epoch, jnp.float32)[..., None] >= ms, axis=-1)
        return (base_lr * gamma ** n).astype(jnp.float32)
    return fn


def exponential_sweep_lr(start_lr: float, end_lr: float,
                         num_iter: int) -> Schedule:
    """lr = start * (end/start)^((step+1)/num_iter) — the reference steps the
    scheduler once at construction (torch _LRScheduler), so iteration i uses
    exponent (i+1)/num_iter."""
    def fn(step):
        r = (jnp.asarray(step, jnp.float32) + 1.0) / num_iter
        return jnp.asarray(start_lr * (end_lr / start_lr) ** r, jnp.float32)
    return fn


def constant_lr(lr: float) -> Schedule:
    return lambda step: jnp.full((), lr, jnp.float32)


def warmup_then_multistep(base_lr: float, warm_iters: int,
                          milestones: Sequence[int],
                          steps_per_epoch: int,
                          gamma: float = 0.1) -> Schedule:
    """The legacy TPU trainer's composite recipe (legacy/train_tpu.py:86-97):
    linear per-iteration warmup for ``warm_iters`` steps, then MultiStepLR
    by epoch (epoch = step // steps_per_epoch)."""
    warm = warmup_lr(base_lr, warm_iters)
    ms = multistep_lr(base_lr, milestones, gamma)

    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(s / steps_per_epoch)
        return jnp.where(s <= warm_iters, warm(step), ms(epoch))
    return fn
