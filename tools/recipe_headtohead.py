"""Full-recipe head-to-head: reference implementation (torch, CPU) vs ours
on the same non-saturating synthetic task.

The lockstep test (tests/test_trajectory_parity.py) proves step-for-step
loss agreement on identical batches; this tool answers the remaining
question — does the *whole recipe* (AdamW lr 5e-4, OneCycleLR per batch,
unweighted CE, per-epoch eval; /root/reference/train.py:100-134) land at
the same final quality when each side trains normally (own shuffling, many
epochs) on data hard enough to rank recipes (hard_synthetic_arrays: color
Bayes ~24%, texture readable only with spatial context)?

Writes run_artifacts/recipe_headtohead.json with per-epoch mIOU for both
sides, for UNet and SegNet, plus the task's color-only Bayes accuracy.

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/recipe_headtohead.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.trajectory_lockstep import import_reference_model  # noqa: E402

HW = (48, 64)
N_TRAIN, N_VAL = 32, 16
BATCH = 8
EPOCHS = 12        # UNet is decisive by 12; SegNet's unpool decoder
EPOCHS_SEGNET = 36  # learns ~3x slower from scratch (measured curves)
LR = 5e-4
MEAN = (0.5, 0.5, 0.5)
STD = (0.25, 0.25, 0.25)


def _miou_from_cm(cm: np.ndarray, ignore_index: int = 11) -> float:
    inter = np.diag(cm).astype(np.float64)
    union = cm.sum(0) + cm.sum(1) - np.diag(cm)
    iou = inter / np.maximum(union, 1e-9)
    keep = [i for i in range(cm.shape[0]) if i != ignore_index]
    return float(np.mean(iou[keep]))


def _normalize(images_u8: np.ndarray) -> np.ndarray:
    x = images_u8.astype(np.float32) / 255.0
    return (x - np.asarray(MEAN, np.float32)) / np.asarray(STD, np.float32)


def run_reference_recipe(net_name: str, cls_name: str, train, val,
                         seed: int = 0, epochs: int = EPOCHS):
    """The reference training loop, faithfully: AdamW + OneCycleLR stepped
    per batch + plain CE (train.py:100-134), eval via the confusion-matrix
    Metrics definition (legacy/metrics.py / eval.py:40-72)."""
    import torch
    import torch.nn as nn
    import torch.optim as optim

    ref = import_reference_model(net_name)
    if ref is None:
        raise RuntimeError("reference models unavailable")
    torch.manual_seed(seed)
    net = getattr(ref, cls_name)(3, 12)
    xs = torch.from_numpy(_normalize(train[0]).transpose(0, 3, 1, 2))
    ys = torch.from_numpy(train[1].astype(np.int64))
    xv = torch.from_numpy(_normalize(val[0]).transpose(0, 3, 1, 2))
    yv = val[1].astype(np.int64)

    steps_per_epoch = len(xs) // BATCH
    optimizer = optim.AdamW(net.parameters(), lr=LR, weight_decay=0)
    sched = optim.lr_scheduler.OneCycleLR(
        optimizer, max_lr=LR, total_steps=steps_per_epoch * epochs)
    loss_fn = nn.CrossEntropyLoss()
    g = torch.Generator().manual_seed(seed + 1)

    curve = []
    for epoch in range(epochs):
        net.train()
        perm = torch.randperm(len(xs), generator=g)
        for b in range(steps_per_epoch):
            idx = perm[b * BATCH:(b + 1) * BATCH]
            optimizer.zero_grad()
            loss = loss_fn(net(xs[idx]), ys[idx])
            loss.backward()
            optimizer.step()
            sched.step()
        net.eval()
        cm = np.zeros((12, 12), np.int64)
        with torch.no_grad():
            for lo in range(0, len(xv), BATCH):
                preds = net(xv[lo:lo + BATCH]).argmax(1).numpy()
                want = yv[lo:lo + BATCH]
                cm += np.bincount(
                    (want.reshape(-1) * 12 + preds.reshape(-1)),
                    minlength=144).reshape(12, 12)
        curve.append(round(_miou_from_cm(cm), 4))
    return curve


def run_our_recipe(net_name: str, train, val, seed: int = 0,
                   epochs: int = EPOCHS):
    """Our recipe on the same raw arrays, mirrored from the library
    primitives with no augmentation (matching the torch arm) so both sides
    see identically-distributed data."""
    import jax
    import jax.numpy as jnp
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.ops.metrics import confusion_matrix
    from pytorch_camvid_tpu.train import (
        TrainState, adamw, make_train_step, make_eval_step, onecycle_lr,
        onecycle_beta1)

    init_fn, apply_fn = get_model(net_name, 3, 12)
    variables = init_fn(jax.random.PRNGKey(seed))
    opt = adamw(weight_decay=0.0)
    steps_per_epoch = len(train[0]) // BATCH
    total = steps_per_epoch * epochs
    step = jax.jit(make_train_step(apply_fn, opt, onecycle_lr(LR, total),
                                   onecycle_beta1(total),
                                   log_grad_norms=False))
    eval_step = jax.jit(make_eval_step(apply_fn, 12, ignore_index=None))
    state = TrainState.create(variables, opt)

    xs = jnp.asarray(_normalize(train[0]))
    ys = jnp.asarray(train[1].astype(np.int32))
    xv = jnp.asarray(_normalize(val[0]))
    yv = jnp.asarray(val[1].astype(np.int32))
    rng = np.random.default_rng(seed + 1)

    curve = []
    for epoch in range(epochs):
        perm = rng.permutation(len(train[0]))
        for b in range(steps_per_epoch):
            idx = perm[b * BATCH:(b + 1) * BATCH]
            state, _ = step(state, (xs[idx], ys[idx]))
        cm = np.zeros((12, 12), np.float64)
        for lo in range(0, len(val[0]), BATCH):
            _, c = eval_step(state, (xv[lo:lo + BATCH], yv[lo:lo + BATCH]))
            cm += np.asarray(c, np.float64)
        curve.append(round(_miou_from_cm(cm), 4))
    return curve


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from pytorch_camvid_tpu.data.synthetic import (
        hard_synthetic_arrays, color_bayes_accuracy)

    train = hard_synthetic_arrays(N_TRAIN, HW, seed=0)
    val = hard_synthetic_arrays(N_VAL, HW, seed=1)
    bayes = color_bayes_accuracy(*val)

    out = {"task": {"hw": HW, "n_train": N_TRAIN, "n_val": N_VAL,
                    "batch": BATCH, "epochs": EPOCHS,
                    "epochs_segnet": EPOCHS_SEGNET, "lr": LR,
                    "color_only_bayes_acc": round(bayes, 4)},
           "nets": {}}
    for net_name, cls_name in [("unet", "UNet"), ("segnet", "SegNet")]:
        ep = EPOCHS_SEGNET if net_name == "segnet" else EPOCHS
        t0 = time.time()
        ours = run_our_recipe(net_name, train, val, seed=0, epochs=ep)
        t_ours = time.time() - t0
        # a second seed for ours bounds run-to-run noise on this task
        ours2 = run_our_recipe(net_name, train, val, seed=7, epochs=ep)
        t0 = time.time()
        theirs = run_reference_recipe(net_name, cls_name, train, val,
                                      seed=0, epochs=ep)
        t_ref = time.time() - t0
        noise = abs(ours[-1] - ours2[-1])
        out["nets"][net_name] = {
            "ours_miou_curve": ours,
            "ours_seed7_final": ours2[-1],
            "reference_miou_curve": theirs,
            "final_gap": round(ours[-1] - theirs[-1], 4),
            "seed_noise": round(noise, 4),
            "wall_s": {"ours": round(t_ours, 1),
                       "reference": round(t_ref, 1)},
        }
        print(f"{net_name}: ours {ours[-1]:.4f} (seed7 {ours2[-1]:.4f}) "
              f"vs reference {theirs[-1]:.4f}  "
              f"[color-only bayes acc {bayes:.3f}]")
    os.makedirs("run_artifacts", exist_ok=True)
    with open("run_artifacts/recipe_headtohead.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote run_artifacts/recipe_headtohead.json")


if __name__ == "__main__":
    main()
