"""Checkpointing (reference: torch.save(net.state_dict()) at train.py:232-240,
discovery at utils.py:95-145).

Parity + upgrades (SURVEY.md §5.4):
- same run-folder layout  checkpoints/<ISO-timestamp>/<epoch>-{best|regular}.*
  and the same best/regular cadence;
- the checkpoint is the FULL train state (params, BN stats, optimizer
  moments, step, RNG) so resume is step-exact — the reference loses
  optimizer/schedule state and re-derives the epoch from the filename
  (train.py:111-114);
- format: a single .npz of flattened pytree leaves + a JSON treedef, written
  atomically; loading restores onto any device/sharding via device_put.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Optional

import numpy as np
import jax

SUFFIX = ".ckpt.npz"


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(path: str, state: Any, meta: Optional[dict] = None):
    """Write a pytree checkpoint atomically. ``meta`` is free-form JSON
    (epoch, mIOU, config fingerprint ...)."""
    leaves, treedef = _flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    payload = {
        "treedef": str(treedef),
        "meta": meta or {},
        "n_leaves": len(leaves),
    }
    tmp = path + ".tmp.npz"
    np.savez(tmp[:-4], __payload__=json.dumps(payload), **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, like: Any, sharding=None):
    """Restore a checkpoint into the structure of ``like`` (a template
    pytree, e.g. a freshly initialized TrainState). Returns (state, meta)."""
    z = np.load(path, allow_pickle=False)
    payload = json.loads(str(z["__payload__"]))
    leaves_t, treedef = jax.tree_util.tree_flatten(like)
    n = payload["n_leaves"]
    if n != len(leaves_t):
        raise ValueError(
            f"checkpoint has {n} leaves, template has {len(leaves_t)} — "
            "model/optimizer mismatch")
    # leaf count+shapes can coincide across different structures; the saved
    # treedef string is the authoritative structure fingerprint
    if payload.get("treedef") not in (None, str(treedef)):
        raise ValueError(
            f"checkpoint treedef does not match the template structure — "
            f"wrong model/optimizer for {path}:\n"
            f"  checkpoint: {payload['treedef'][:200]}...\n"
            f"  template:   {str(treedef)[:200]}...")
    leaves = []
    for i, tmpl in enumerate(leaves_t):
        arr = z[f"leaf_{i}"]
        if hasattr(tmpl, "shape") and tuple(arr.shape) != tuple(tmpl.shape):
            raise ValueError(f"leaf {i}: checkpoint shape {arr.shape} != "
                             f"template shape {tmpl.shape}")
        if sharding is not None:
            # put_global: multi-process-safe placement (every process loads
            # the same file; each materializes only its addressable shards)
            from pytorch_camvid_tpu.parallel.multihost import put_global
            arr = put_global(arr, sharding)
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves), payload["meta"]


def checkpoint_name(folder: str, epoch: int, kind: str) -> str:
    """checkpoints/<run>/<epoch>-{best|regular|preempt}.ckpt.npz
    (train.py:42; 'preempt' is ours — the SIGTERM mid-epoch save gets its
    own name so it can never overwrite a clean end-of-epoch checkpoint)."""
    return os.path.join(folder, f"{epoch}-{kind}{SUFFIX}")


def get_weight_path(checkpoint_root: str) -> str:
    """Newest-mtime best/regular checkpoint across all run dirs — the same
    discovery contract as utils.get_weight_path (utils.py:95-145); returns
    '' when nothing is found."""
    checkpoint_root = os.path.abspath(checkpoint_root)
    files = glob.glob(os.path.join(checkpoint_root, "*", "*" + SUFFIX))
    # also accept reference-style .pth names for directory-layout parity
    files += glob.glob(os.path.join(checkpoint_root, "*", "*.pth"))
    candidates = [
        f for f in files
        if re.search(r"[0-9]+-(best|regular|preempt)\.", os.path.basename(f))]
    if not candidates:
        return ""
    return max(candidates, key=os.path.getmtime)


def parse_epoch(weight_path: str) -> int:
    """Epoch from a '<epoch>-{best|regular|preempt}' filename
    (train.py:112-113)."""
    m = re.search(r"([0-9]+)-(best|regular|preempt)\.",
                  os.path.basename(weight_path))
    if not m:
        raise ValueError(f"cannot parse epoch from {weight_path}")
    return int(m.group(1))
