"""Training-step time breakdown on the real chip (feeds PERF.md).

Times nested subsets of the jit-fused training step so the difference
between consecutive rows isolates one component:

  aug        : batch gather + on-device augmentation only
  fwd        : + forward pass (train-mode BN)
  fwd_loss   : + loss
  grad       : + backward
  full       : + optimizer update (the real train step)

Each subset runs K chained iterations inside one jit (same methodology as
tools/perf_probe.py) with a trivial-baseline subtraction.

Usage: python tools/train_breakdown.py [--batch 24] [--k 10] [--net unet]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--net", type=str, default="unet")
    args = ap.parse_args()

    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from pytorch_camvid_tpu.config import settings
    from pytorch_camvid_tpu.data.augment import (
        AugmentConfig, make_train_augment)
    from pytorch_camvid_tpu.data.synthetic import synthetic_arrays
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.ops.loss import cross_entropy_loss
    from pytorch_camvid_tpu.train import (
        TrainState, adamw, make_train_step, onecycle_lr, onecycle_beta1)

    b = args.batch
    images, labels = synthetic_arrays(max(2 * b, 48), hw=(360, 480))
    d_images = jnp.asarray(images)
    d_labels = jnp.asarray(labels)
    init_fn, apply_fn = get_model(args.net, 3, 12)
    variables = jax.tree.map(np.asarray, init_fn(jax.random.PRNGKey(0)))
    opt = adamw(weight_decay=0.0)
    cfg = AugmentConfig(mean=settings.MEAN, std=settings.STD,
                        rotation_fill=11, scale_fill=11)
    augment = make_train_augment(cfg, compute_dtype=jnp.bfloat16)
    # pin to device once: a host-backed state would re-ride the tunnel
    # (~400 MB) inside every timed call
    state0 = jax.device_put(TrainState.create(variables, opt))
    jax.block_until_ready(jax.tree.leaves(state0.params)[0])

    def gather(rng_key, i):
        idx = jax.random.randint(rng_key, (b,), 0, d_images.shape[0])
        return (jnp.take(d_images, idx, axis=0),
                jnp.take(d_labels, idx, axis=0))

    def mode_fn(mode):
        step = make_train_step(apply_fn, opt, onecycle_lr(5e-4, 1000),
                               onecycle_beta1(1000), augment_fn=augment,
                               compute_dtype=jnp.bfloat16,
                               log_grad_norms=False)

        def body(i, carry):
            state, acc = carry
            key = jax.random.fold_in(state.rng, i)
            imgs, labs = gather(key, i)
            if mode == "gather":
                return state, acc + jnp.sum(imgs[:, 0, 0, 0].astype(
                    jnp.float32))
            x, m = augment(key, imgs, labs)
            if mode == "aug":
                return state, acc + jnp.sum(x[:, 0, 0, :].astype(
                    jnp.float32))
            if mode == "fwd":
                logits, _ = apply_fn(
                    {"params": state.params, "state": state.bn_state}, x,
                    train=True, compute_dtype=jnp.bfloat16)
                return state, acc + jnp.sum(logits[:, 0, 0, :])
            if mode == "fwd_loss":
                logits, _ = apply_fn(
                    {"params": state.params, "state": state.bn_state}, x,
                    train=True, compute_dtype=jnp.bfloat16)
                return state, acc + cross_entropy_loss(
                    logits, m.astype(jnp.int32))
            if mode == "grad":
                def loss_fn(p):
                    logits, _ = apply_fn(
                        {"params": p, "state": state.bn_state}, x,
                        train=True, compute_dtype=jnp.bfloat16)
                    return cross_entropy_loss(logits, m.astype(jnp.int32))
                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                gnorm = sum(jnp.sum(jnp.square(g))
                            for g in jax.tree.leaves(grads))
                return state, acc + loss + 1e-30 * gnorm
            # full
            new_state, metrics = step(state, (imgs, labs))
            return new_state, acc + metrics["loss"]

        def run(state):
            return jax.lax.fori_loop(
                0, args.k, body, (state, jnp.float32(0.0)))
        return jax.jit(run)

    results = {}
    for mode in ["gather", "aug", "fwd", "fwd_loss", "grad", "full"]:
        f = mode_fn(mode)
        s, acc = f(state0)
        float(acc)
        t0 = time.perf_counter()
        s, acc = f(state0)
        float(acc)
        dt = (time.perf_counter() - t0) / args.k
        results[mode] = round(1000 * dt, 2)
        print(f"{mode:9s}: {1000 * dt:8.2f} ms/step "
              f"({b / dt:7.1f} img/s)", flush=True)

    deltas = {
        "gather": results["gather"],
        "augment": results["aug"] - results["gather"],
        "forward": results["fwd"] - results["aug"],
        "loss": results["fwd_loss"] - results["fwd"],
        "backward": results["grad"] - results["fwd_loss"],
        "optimizer+bn": results["full"] - results["grad"],
    }
    print(json.dumps({"batch": b, "net": args.net, "ms": results,
                      "deltas_ms": deltas}))


if __name__ == "__main__":
    main()
