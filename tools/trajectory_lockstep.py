"""Lockstep trajectory comparison against the reference implementation.

Rebuilds the reference's exact training recipe in torch (AdamW lr 5e-4
wd 0, OneCycleLR stepped per batch, unweighted CrossEntropyLoss —
/root/reference/train.py:100-134), transfers an identical init onto the
reference's own model classes via the interop, feeds bit-identical batches
(no augmentation), and trains both sides N steps on CPU, recording per-step
losses.

Per-op parity is proven by the oracle tests; this measures the thing they
can't — compounded-over-steps recipe drift (BN-momentum interaction,
schedule boundaries, optimizer state evolution). Used standalone for
calibration and by tests/test_trajectory_parity.py.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np

_REF_MODELS = "/root/reference/models"


def import_reference_model(module: str):
    path = os.path.join(_REF_MODELS, module + ".py")
    if not os.path.exists(path):
        return None
    spec = importlib.util.spec_from_file_location(f"_ref_{module}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_batches(n_steps: int, batch: int, hw, num_classes: int = 12,
                 seed: int = 0):
    """Deterministic normalized-float batches fed identically to both
    sides: images ~ N(0,1) NHWC float32, labels uniform ints."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_steps):
        x = rng.normal(size=(batch, hw[0], hw[1], 3)).astype(np.float32)
        y = rng.integers(0, num_classes, size=(batch, hw[0], hw[1]),
                         dtype=np.int64)
        out.append((x, y))
    return out


def run_torch(net_name: str, cls_name: str, state_dict, batches,
              recipe: str = "adamw_onecycle", lr: float = 5e-4,
              num_classes: int = 12):
    """The reference recipes verbatim: 'adamw_onecycle' is the main trainer
    (train.py:100-134); 'sgd' is the legacy TPU trainer's optimizer
    (legacy/train_tpu.py:77-84: SGD momentum .9, nesterov, wd 1e-4) at a
    constant lr — the linear-update control arm (Adam's sign-like early
    updates amplify float noise; SGD does not, so it isolates fwd/bwd/BN
    compounding from optimizer chaos)."""
    import torch
    import torch.nn as nn
    import torch.optim as optim

    torch.manual_seed(0)
    ref = import_reference_model(net_name)
    net = getattr(ref, cls_name)(3, num_classes)
    net.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                         for k, v in state_dict.items()}, strict=True)
    net.train()
    sched = None
    if recipe == "adamw_onecycle":
        optimizer = optim.AdamW(net.parameters(), lr=lr, weight_decay=0)
        sched = optim.lr_scheduler.OneCycleLR(optimizer, max_lr=lr,
                                              total_steps=len(batches))
    elif recipe == "sgd":
        optimizer = optim.SGD(net.parameters(), lr=1e-3, momentum=0.9,
                              nesterov=True, weight_decay=1e-4)
    else:
        raise ValueError(recipe)
    loss_fn = nn.CrossEntropyLoss()
    losses = []
    for x, y in batches:
        optimizer.zero_grad()
        preds = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        loss = loss_fn(preds, torch.from_numpy(y))
        loss.backward()
        optimizer.step()
        if sched is not None:
            sched.step()
        losses.append(float(loss.item()))
    return np.asarray(losses), net


def run_ours(net_name: str, variables, batches,
             recipe: str = "adamw_onecycle", lr: float = 5e-4,
             num_classes: int = 12):
    import jax
    import jax.numpy as jnp
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.train import (
        TrainState, adamw, sgd, make_train_step, onecycle_lr,
        onecycle_beta1)

    _, apply_fn = get_model(net_name, 3, num_classes)
    n = len(batches)
    if recipe == "adamw_onecycle":
        opt = adamw(weight_decay=0.0)
        step = make_train_step(apply_fn, opt, onecycle_lr(lr, n),
                               onecycle_beta1(n), log_grad_norms=False)
    elif recipe == "sgd":
        opt = sgd(momentum=0.9, nesterov=True, weight_decay=1e-4)
        step = make_train_step(apply_fn, opt,
                               lambda s: jnp.float32(1e-3),
                               log_grad_norms=False)
    else:
        raise ValueError(recipe)
    step = jax.jit(step)
    state = TrainState.create(variables, opt)
    losses = []
    for x, y in batches:
        state, metrics = step(state, (jnp.asarray(x), jnp.asarray(y)))
        losses.append(float(metrics["loss"]))
    return np.asarray(losses), state


def lockstep(net_name: str, cls_name: str, n_steps: int = 50,
             batch: int = 2, hw=(32, 32), seed: int = 0,
             recipe: str = "adamw_onecycle"):
    """Returns (ours_losses, torch_losses, final_state, torch_net).

    hw must keep every dim >= 32: SegNet pools 5x (32 -> 1); smaller
    collapses a spatial dim to zero (torch errors identically)."""
    import jax
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.interop import state_dict_from_variables

    init_fn, _ = get_model(net_name, 3, 12)
    variables = init_fn(jax.random.PRNGKey(seed))
    sd = state_dict_from_variables(net_name, variables)
    batches = make_batches(n_steps, batch, hw, seed=seed + 1)
    ours, state = run_ours(net_name, variables, batches, recipe)
    theirs, net = run_torch(net_name, cls_name, sd, batches, recipe)
    return ours, theirs, state, net


def main():
    import json
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    out = {}
    for net_name, cls_name in [("unet", "UNet"), ("segnet", "SegNet")]:
        for recipe in ("sgd", "adamw_onecycle"):
            ours, theirs, _, _ = lockstep(net_name, cls_name, recipe=recipe)
            d = np.abs(ours - theirs)
            rel = d / np.maximum(np.abs(theirs), 1e-8)
            print(f"{net_name} [{recipe}]: steps={len(ours)}")
            print(f"  first5 ours   {ours[:5]}")
            print(f"  first5 torch  {theirs[:5]}")
            print(f"  last5  ours   {ours[-5:]}")
            print(f"  last5  torch  {theirs[-5:]}")
            print(f"  max|d| {d.max():.3e} at step {d.argmax()}  "
                  f"max rel {rel.max():.3e}")
            print(f"  mean|d| {d.mean():.3e}")
            out[f"{net_name}_{recipe}"] = {
                "steps": len(ours),
                "ours": [round(float(v), 6) for v in ours],
                "torch": [round(float(v), 6) for v in theirs],
                "max_abs_diff": round(float(d.max()), 6),
                "mean_abs_diff": round(float(d.mean()), 6),
                "max_rel_diff": round(float(rel.max()), 6),
            }
    os.makedirs("run_artifacts", exist_ok=True)
    with open("run_artifacts/trajectory_lockstep.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote run_artifacts/trajectory_lockstep.json")


if __name__ == "__main__":
    sys.exit(main())
