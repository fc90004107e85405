"""Full-recipe head-to-head: reference implementation (torch, CPU) vs ours
on the same non-saturating synthetic task.

The lockstep test (tests/test_trajectory_parity.py) proves step-for-step
loss agreement on identical batches; this tool answers the remaining
question — does the *whole recipe* (AdamW lr 5e-4, OneCycleLR per batch,
unweighted CE, per-epoch eval; /root/reference/train.py:100-134) land at
the same final quality when each side trains normally (own shuffling, many
epochs) on data hard enough to rank recipes (hard_synthetic_arrays: color
Bayes ~24%, texture readable only with spatial context)?

v2 (VERDICT r3 #5): multiple seeds per side, a larger task (96x128,
128 train images — up from the round-3 48x64/32), mean±sd per side and a
programmatic overlap verdict. Legs run incrementally (one seed x net x
side per invocation if desired) and merge into
run_artifacts/recipe_headtohead_v2.json, because the torch arm costs
tens of minutes per seed on the 1-core host; our arm runs on whatever
jax backend is default (the TPU chip when attached — this is a quality
claim, not a bit-parity claim, so the backend is free).

Usage:
  python tools/recipe_headtohead.py --nets unet --seeds 0 1 2
  python tools/recipe_headtohead.py --summarize   # print verdict table
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.trajectory_lockstep import import_reference_model  # noqa: E402

HW = (96, 128)
N_TRAIN, N_VAL = 128, 32
BATCH = 8
EPOCHS = {"unet": 10, "segnet": 16}  # SegNet's unpool decoder learns
# slower from scratch; at the v2 task size (16 steps/epoch, 4x the pixels)
# both curves flatten well before these caps (recorded curves in the json)
LR = 5e-4
MEAN = (0.5, 0.5, 0.5)
STD = (0.25, 0.25, 0.25)
OUT = os.path.join("run_artifacts", "recipe_headtohead_v2.json")


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
                         seed: int, epochs: int):
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
        print(f"  ref {net_name} seed{seed} epoch {epoch + 1}/{epochs}: "
              f"miou {curve[-1]:.4f}", flush=True)
    return curve


def run_our_recipe(net_name: str, train, val, seed: int, epochs: int):
    """Our recipe on the same raw arrays, mirrored from the library
    primitives with no augmentation (matching the torch arm) so both sides
    see identically-distributed data."""
    import jax
    import jax.numpy as jnp
    from pytorch_camvid_tpu.models import get_model
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


def _load():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {"task": {"hw": HW, "n_train": N_TRAIN, "n_val": N_VAL,
                     "batch": BATCH, "epochs": EPOCHS, "lr": LR},
            "legs": {}}


def _save(doc):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1)
    os.replace(tmp, OUT)


def summarize(doc):
    """Per-net mean±sd for both sides + overlap verdict. The claim shipped
    in README: the recipes land within each other's seed spread."""
    summary = {}
    for net in ("unet", "segnet"):
        ours = [v["curve"][-1] for k, v in doc["legs"].items()
                if v["net"] == net and v["side"] == "ours"]
        ref = [v["curve"][-1] for k, v in doc["legs"].items()
               if v["net"] == net and v["side"] == "reference"]
        if not ours or not ref:
            continue
        mo, so = float(np.mean(ours)), float(np.std(ours))
        mr, sr = float(np.mean(ref)), float(np.std(ref))
        gap = mo - mr
        # overlap: |mean gap| within the combined 2-sigma seed spread
        # (plus an absolute floor for the tiny-variance case)
        tol = 2.0 * (so + sr) + 0.01
        summary[net] = {
            "ours_mean": round(mo, 4), "ours_sd": round(so, 4),
            "ref_mean": round(mr, 4), "ref_sd": round(sr, 4),
            "n_seeds": [len(ours), len(ref)],
            # the full-strength claim needs >=3 seeds per side; legs run
            # incrementally (the torch arm costs ~30-50 min/seed on this
            # 1-core host), so partially-seeded nets are recorded but
            # marked incomplete and asserted softly by the tier test
            "complete": min(len(ours), len(ref)) >= 3,
            "gap": round(gap, 4), "tol_2sigma": round(tol, 4),
            "overlap": bool(abs(gap) <= tol) or gap > 0,
        }
        print(f"{net}: ours {mo:.4f}±{so:.4f} (n={len(ours)}) vs "
              f"reference {mr:.4f}±{sr:.4f} (n={len(ref)}) -> gap "
              f"{gap:+.4f} (tol {tol:.4f}) "
              f"{'OVERLAP/AHEAD' if summary[net]['overlap'] else 'GAP'}")
    doc["summary"] = summary
    return doc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nets", nargs="*", default=["unet", "segnet"])
    ap.add_argument("--seeds", nargs="*", type=int, default=[0, 1, 2])
    ap.add_argument("--sides", nargs="*", default=["ours", "reference"])
    ap.add_argument("--summarize", action="store_true")
    args = ap.parse_args()

    doc = _load()
    if args.summarize:
        _save(summarize(doc))
        return

    from pytorch_camvid_tpu.data.synthetic import (
        hard_synthetic_arrays, color_bayes_accuracy)
    train = hard_synthetic_arrays(N_TRAIN, HW, seed=0)
    val = hard_synthetic_arrays(N_VAL, HW, seed=1)
    doc["task"]["color_only_bayes_acc"] = round(
        color_bayes_accuracy(*val), 4)

    for net in args.nets:
        cls = {"unet": "UNet", "segnet": "SegNet"}[net]
        for seed in args.seeds:
            for side in args.sides:
                key = f"{net}/{side}/seed{seed}"
                if key in doc["legs"]:
                    print(f"skip {key} (already recorded)")
                    continue
                t0 = time.time()
                if side == "ours":
                    curve = run_our_recipe(net, train, val, seed,
                                           EPOCHS[net])
                else:
                    curve = run_reference_recipe(net, cls, train, val,
                                                 seed, EPOCHS[net])
                doc["legs"][key] = {
                    "net": net, "side": side, "seed": seed,
                    "curve": curve, "wall_s": round(time.time() - t0, 1)}
                _save(doc)
                print(f"{key}: final {curve[-1]:.4f} "
                      f"({doc['legs'][key]['wall_s']}s)", flush=True)
    _save(summarize(doc))


if __name__ == "__main__":
    main()
