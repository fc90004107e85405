"""Train state: a single pytree carrying everything a step needs.

The reference checkpoints only `net.state_dict()` (train.py:234) and infers
the epoch from the filename (SURVEY.md §5.3-5.4). Here the state is complete
— params, BN running stats, optimizer state, step counter, RNG key — so
resume is step-exact.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    bn_state: Any
    opt_state: Any
    step: jax.Array        # int32 scalar, counts optimizer steps
    rng: jax.Array         # PRNG key for on-device augmentation

    @staticmethod
    def create(variables, optimizer, rng=None) -> "TrainState":
        return TrainState(
            params=variables["params"],
            bn_state=variables["state"],
            opt_state=optimizer.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            rng=rng if rng is not None else jax.random.PRNGKey(0),
        )

    def variables(self):
        return {"params": self.params, "state": self.bn_state}
