"""In-framework optimizers with torch-exact update rules, fused under jit.

Reference: optim.AdamW(lr=5e-4, weight_decay=0) (train.py:100) and
SGD(momentum=.9, nesterov=True, wd=1e-4) (legacy/train_tpu.py:77-84).

Both take the learning rate — and for AdamW the beta1 — as *per-step traced
scalars*, because OneCycleLR cycles beta1 over training (train.py:143 logs
it). torch computes bias corrections as beta1^t with the *current* beta1;
we reproduce that, including the 1-based step count.

API (optax-style):
    opt = adamw(weight_decay=0.0)
    opt_state = opt.init(params)
    new_params, new_opt_state = opt.update(grads, opt_state, params,
                                           step, lr, beta1)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Optimizer:
    init: Callable[[Any], Any]
    update: Callable[..., Any]


def adamw(beta2: float = 0.999, eps: float = 1e-8,
          weight_decay: float = 0.0) -> Optimizer:
    """torch.optim.AdamW semantics (decoupled weight decay applied as
    p *= 1 - lr*wd before the Adam step)."""

    def init(params):
        zeros = lambda p: jnp.zeros_like(p)
        return {"m": jax.tree.map(zeros, params),
                "v": jax.tree.map(zeros, params)}

    def update(grads, opt_state, params, step, lr,
               beta1: Optional[jax.Array] = 0.9):
        t = jnp.asarray(step, jnp.float32) + 1.0  # torch is 1-based
        b1 = jnp.asarray(beta1, jnp.float32)
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - beta2 ** t

        def leaf(p, g, m, v):
            g = g.astype(jnp.float32)
            m2 = b1 * m + (1.0 - b1) * g
            v2 = beta2 * v + (1.0 - beta2) * jnp.square(g)
            denom = jnp.sqrt(v2) / jnp.sqrt(bc2) + eps
            p2 = p * (1.0 - lr * weight_decay)
            p2 = p2 - (lr / bc1) * m2 / denom
            return p2, m2, v2

        out = jax.tree.map(leaf, params, grads, opt_state["m"],
                           opt_state["v"])
        new_params = jax.tree.map(lambda o: o[0], out,
                                  is_leaf=lambda x: isinstance(x, tuple))
        new_m = jax.tree.map(lambda o: o[1], out,
                             is_leaf=lambda x: isinstance(x, tuple))
        new_v = jax.tree.map(lambda o: o[2], out,
                             is_leaf=lambda x: isinstance(x, tuple))
        return new_params, {"m": new_m, "v": new_v}

    return Optimizer(init, update)


def sgd(momentum: float = 0.9, nesterov: bool = True,
        weight_decay: float = 1e-4) -> Optimizer:
    """torch.optim.SGD semantics (legacy/train_tpu.py:77-84). The first step
    initializes the momentum buffer to the gradient (torch's
    `buf = g` on first use), which we reproduce with a step guard."""

    def init(params):
        return {"buf": jax.tree.map(jnp.zeros_like, params)}

    def update(grads, opt_state, params, step, lr, beta1=None):
        first = jnp.asarray(step, jnp.int32) == 0

        def leaf(p, g, buf):
            g = g.astype(jnp.float32) + weight_decay * p
            buf2 = jnp.where(first, g, momentum * buf + g)
            d = g + momentum * buf2 if nesterov else buf2
            return p - lr * d, buf2

        out = jax.tree.map(leaf, params, grads, opt_state["buf"])
        new_params = jax.tree.map(lambda o: o[0], out,
                                  is_leaf=lambda x: isinstance(x, tuple))
        new_buf = jax.tree.map(lambda o: o[1], out,
                               is_leaf=lambda x: isinstance(x, tuple))
        return new_params, {"buf": new_buf}

    return Optimizer(init, update)
