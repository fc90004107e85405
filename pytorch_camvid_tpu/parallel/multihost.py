"""Multi-process (multi-host) runtime support.

SURVEY.md §5.8 / §2.3 name ``jax.distributed.initialize`` + the
('slice','data') mesh as the TPU-native replacement for the reference's
single-process torch_xla runtime (legacy/train_tpu.py:16-20). The mesh
and collective layers (parallel/mesh.py, data_parallel.py) are already
process-count-agnostic — ``jax.devices()`` is the GLOBAL device list —
but three host-side pieces are process-aware, and they live here:

- :func:`init_distributed` — the one call a pod launcher makes per host
  (CLI: ``train.py -multihost``);
- :func:`put_global` — build a globally-sharded array from host data that
  every process holds in full (the HBM-resident dataset pattern: each
  host reads the same dataset files, each device receives only its
  shard);
- :func:`is_primary` — gate console/TB/checkpoint writes to process 0
  (every process computes identical replicated metrics; only one may
  write).

Verified by a REAL 2-process CPU run (tests/test_multihost.py): two
workers over a 4-device global mesh produce bit-identical training losses
that match a single-process run of the same global batch.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None,
                     initialization_timeout: Optional[int] = None):
    """Initialize the JAX distributed runtime (call BEFORE any other jax
    use — the backend freezes at first device query).

    With no arguments, reads the ``PCT_COORDINATOR`` / ``PCT_NUM_PROCS`` /
    ``PCT_PROC_ID`` environment (our launcher contract) and falls back to
    ``jax.distributed.initialize()``'s own auto-detection (TPU pod
    metadata) when they are unset. Returns (process_index, process_count).

    initialization_timeout (seconds; also env ``PCT_INIT_TIMEOUT``):
    how long workers wait for the coordinator and for each other before
    giving up. On oversubscribed hosts (CI, a 1-core box compiling in
    N processes at once) workers can start minutes apart — pass a
    generous value there; forwarded only when this jax version supports
    the parameter.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "PCT_COORDINATOR")
    if num_processes is None and os.environ.get("PCT_NUM_PROCS"):
        num_processes = int(os.environ["PCT_NUM_PROCS"])
    if process_id is None and os.environ.get("PCT_PROC_ID"):
        process_id = int(os.environ["PCT_PROC_ID"])
    if initialization_timeout is None and os.environ.get(
            "PCT_INIT_TIMEOUT"):
        initialization_timeout = int(os.environ["PCT_INIT_TIMEOUT"])
    kw = {}
    if initialization_timeout is not None:
        import inspect
        sig = inspect.signature(jax.distributed.initialize)
        if "initialization_timeout" in sig.parameters:
            kw["initialization_timeout"] = initialization_timeout
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids, **kw)
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the process that owns host-side writes (console, TB,
    checkpoints). Single-process runs are always primary."""
    return jax.process_index() == 0


def put_global(x, sharding):
    """Place host data onto a (possibly multi-process) sharding.

    ``x`` must be the FULL global array, identical on every process — the
    dataset-replication contract (each host loads the same files; cf. the
    reference's per-worker full dataset copies, train.py:80-84). Single
    process: a plain ``device_put``. Multi-process: each process
    materializes only its addressable shards via
    ``jax.make_array_from_callback`` (no cross-host transfer)."""
    if jax.process_count() == 1:
        # device_put accepts host OR device arrays — no host round-trip
        # for already-placed single-process trees
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def put_global_tree(tree, sharding):
    """``put_global`` over a pytree (e.g. replicate a TrainState onto a
    multi-process mesh)."""
    return jax.tree.map(lambda v: put_global(v, sharding), tree)
