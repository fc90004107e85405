"""Explicit-collective data parallelism via shard_map.

Reference analogue: the legacy torch_xla trainer (legacy/train_tpu.py) —
one model replica per TPU core with a gradient all-reduce inside
``xm.optimizer_step`` (:115). Here each mesh shard runs the per-replica
step body and the collectives are explicit: ``lax.pmean`` on grads/loss and
BN moments (sync-BN), ``lax.psum`` on confusion matrices — placed by us
rather than inferred by the SPMD partitioner (parallel/data_parallel.py is
the inferred-collective twin; tests assert both agree)."""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P

from pytorch_camvid_tpu.parallel.mesh import DATA_AXIS


def shard_map_train_step(step_fn: Callable, mesh: Mesh):
    """Wrap a train step built with axis_name=DATA_AXIS. State is
    replicated; the batch is split along the data axis; outputs are
    replicated (grads/metrics are pmean'd inside the step)."""
    mapped = jax.shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), (P(DATA_AXIS), P(DATA_AXIS))),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def shard_map_eval_step(step_fn: Callable, mesh: Mesh):
    mapped = jax.shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), (P(DATA_AXIS), P(DATA_AXIS))),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
