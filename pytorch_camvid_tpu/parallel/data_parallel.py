"""Data-parallel execution of the train/eval steps.

Two TPU-native modes, both driven by the same pure step functions
(train/steps.py):

1. ``jit`` + sharding annotations (default): the step is compiled once over
   the mesh; the batch is sharded on the 'data' axis, state is replicated,
   and XLA's SPMD partitioner inserts the gradient all-reduce (psum over
   ICI) automatically because the loss mean spans the sharded batch. This
   replaces the reference's torch_xla ``xm.optimizer_step`` all-reduce
   (legacy/train_tpu.py:115) with compiler-placed collectives.

2. ``shard_map`` with explicit ``lax.pmean``/``psum`` (axis_name='data'),
   for when explicit collective placement is wanted (e.g. sync-BN moments,
   per-replica RNG). Exposed via steps' ``axis_name`` parameter.

BatchNorm note: under mode 1 batch statistics are computed over the GLOBAL
batch (XLA reduces across shards) — i.e. sync-BN, strictly better-behaved
than the reference's single-device stats at global batch 10.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh

from pytorch_camvid_tpu.parallel.mesh import (
    batch_sharding, replicated_sharding)


def shard_batch(batch, mesh: Mesh):
    """Place an (images, labels) host batch onto the mesh, batch-sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def jit_train_step(step_fn: Callable, mesh: Mesh):
    """Compile a train step for the mesh: replicated state, sharded batch."""
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step_fn,
                   in_shardings=(rep, (bsh, bsh)),
                   out_shardings=(rep, rep),
                   donate_argnums=(0,))


def jit_eval_step(step_fn: Callable, mesh: Mesh):
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step_fn,
                   in_shardings=(rep, (bsh, bsh)),
                   out_shardings=(rep, rep))
