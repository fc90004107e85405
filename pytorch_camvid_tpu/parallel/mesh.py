"""Device mesh and sharding helpers.

Reference analogue: legacy/train_tpu.py:211-214 enumerates XLA devices and
replicates the model per TPU core via torch_xla ``dp.DataParallel`` with an
all-reduce inside ``xm.optimizer_step`` (:115).

TPU-native design: a ``jax.sharding.Mesh`` over the chips with a ``('data',
'model')`` axis pair. Parameters are replicated (model axis size 1 — the
34.5M-param convnets never need tensor parallelism, but the axis exists so
a TP layout is a config change, not a rewrite; SURVEY.md §2.2). Batches are
sharded along 'data'; XLA inserts the gradient all-reduce over ICI from the
sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh of shape (data, model). n_data=None uses all available devices
    divided by n_model."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None or n_data <= 0:
        n_data = len(devices) // n_model
    use = devices[: n_data * n_model]
    arr = np.array(use).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_multislice_mesh(n_slice: int, n_data: Optional[int] = None,
                         devices: Optional[Sequence] = None) -> Mesh:
    """('slice', 'data', 'model') mesh for multi-slice (DCN) deployments
    (SURVEY.md §2.3): gradients reduce hierarchically — psum over 'data'
    rides ICI within a slice, psum over 'slice' crosses DCN. On multihost
    pods call jax.distributed.initialize() first; here it is exercised with
    virtual devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_slice
    use = devices[: n_slice * n_data]
    arr = np.array(use).reshape(n_slice, n_data, 1)
    return Mesh(arr, ("slice", DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis (and the slice axis
    on multi-slice meshes)."""
    if "slice" in mesh.axis_names:
        return NamedSharding(mesh, P(("slice", DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
