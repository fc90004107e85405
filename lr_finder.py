"""LR range finder CLI (reference: lr_finder.py — fastai-style sweep).

Runs up to -num_it batches with the geometric ExponentialLR sweep
(lr_scheduler/ExponentialLR.py). Default smoothing/stop semantics match the
reference exactly: the first recorded loss is the raw loss, later losses are
blended as smooth_f*loss + (1-smooth_f)*prev with smooth_f=0.05
(lr_finder.py:86-88), and the sweep stops only when the raw loss goes NaN
(lr_finder.py:76-78) — one difference is unavoidable: the reference checks
NaN *before* applying the optimizer step while our jit-fused step has
already applied it (harmless: the run ends there). ``smoothing='fastai'``
opts into fastai's beta=0.98 bias-corrected smoothing with a
'smoothed > 4x best' divergence stop. Saves a log-x loss-vs-lr curve.
The reference's closure-over-globals bug (lr_finder.py:46,54,63) is fixed
by passing parameters explicitly."""

import argparse

import numpy as np
import jax

from pytorch_camvid_tpu.config import settings
from pytorch_camvid_tpu.data import CamVid
from pytorch_camvid_tpu.data.augment import (
    AugmentConfig, make_train_augment)
from pytorch_camvid_tpu.data.pipeline import DeviceDataLoader
from pytorch_camvid_tpu.models import get_model
from pytorch_camvid_tpu.train import (
    TrainState, adamw, make_train_step, exponential_sweep_lr)


def lr_finder(loader, apply_fn, variables, *, start_lr, end_lr, num_it,
              stop_div, weight_decay, augment_fn, smooth_f=0.05, beta=0.98,
              smoothing="reference"):
    """LR range test (lr_finder.py:17-96). Returns (losses, lrs).

    smoothing='reference' reproduces lr_finder.py:76-88: first loss raw,
    then smooth_f-blend with the previous recorded loss; stop on NaN only
    (stop_div then has no effect, like the reference where it is unused).
    smoothing='fastai' uses bias-corrected EMA (beta) and stops when the
    smoothed loss exceeds 4x the best seen (if stop_div)."""
    opt = adamw(weight_decay=weight_decay)
    lr_fn = exponential_sweep_lr(start_lr, end_lr, num_it)
    step_fn = jax.jit(make_train_step(apply_fn, opt, lr_fn,
                                      augment_fn=augment_fn,
                                      log_grad_norms=False))
    state = TrainState.create(variables, opt)

    losses, lrs = [], []
    avg_loss, best_loss = 0.0, None
    it = 0
    while it < num_it:
        for batch in loader.epoch(it):
            if it >= num_it:
                break
            state, metrics = step_fn(state, batch)
            loss = float(metrics["loss"])
            it += 1
            if smoothing == "reference":
                if np.isnan(loss):
                    # NaN divergence stop (lr_finder.py:76-78); the batch is
                    # dropped from the curve like the reference's break
                    print("Stopping early, the loss has diverged")
                    return np.asarray(losses), np.asarray(lrs)
                # the reference records the lr AFTER scheduler.step()
                # (lr_finder.py:83-89), i.e. the NEXT iteration's lr
                lrs.append(float(lr_fn(it)))
                smoothed = (loss if it == 1
                            else smooth_f * loss
                            + (1 - smooth_f) * losses[-1])
                losses.append(smoothed)
                print("iteration: {}, lr: {:08f}, loss: {:04f}".format(
                    it, lrs[-1], loss))
            else:  # fastai
                lrs.append(float(metrics["lr"]))
                avg_loss = beta * avg_loss + (1 - beta) * loss
                smoothed = avg_loss / (1 - beta ** it)
                losses.append(smoothed)
                best_loss = (smoothed if best_loss is None
                             else min(best_loss, smoothed))
                print(f"iter {it}/{num_it} lr {lrs[-1]:.3e} "
                      f"loss {smoothed:.4f}")
                if stop_div and (smoothed > 4 * best_loss
                                 or np.isnan(smoothed)):
                    print("Stopping early, the loss has diverged")
                    return np.asarray(losses), np.asarray(lrs)
    return np.asarray(losses), np.asarray(lrs)


def plot(loss, lr, skip_start=10, skip_end=5, image_name="lr_finder.jpg"):
    """Loss-vs-lr log-x curve (lr_finder.py:99-114)."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    if skip_end:
        loss, lr = loss[skip_start:-skip_end], lr[skip_start:-skip_end]
    else:
        loss, lr = loss[skip_start:], lr[skip_start:]
    plt.plot(lr, loss)
    plt.xscale("log")
    plt.xlabel("Learning rate")
    plt.ylabel("Loss")
    plt.savefig(image_name)


if __name__ == "__main__":
    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("-b", type=int, default=10,
                        help="batch size for dataloader")
    parser.add_argument("-start_lr", type=float, default=1e-7,
                        help="initial learning rate")
    parser.add_argument("-end_lr", type=float, default=10,
                        help="final learning rate")
    # the reference declares this type=bool (any string is truthy,
    # SURVEY.md §2.5.10); parse real booleans instead
    parser.add_argument("-stop_div", default=True,
                        type=lambda s: s.lower() not in
                        ("false", "0", "no"),
                        help="stops when loss diverges")
    parser.add_argument("-num_it", type=int, default=100,
                        help="number of iterations")
    parser.add_argument("-skip_start", type=int, default=10,
                        help="number of batches to trim from the start")
    parser.add_argument("-skip_end", type=int, default=5,
                        help="number of batches to trim from the end")
    parser.add_argument("-weight_decay", type=float, default=0,
                        help="weight decay factor")
    parser.add_argument("-smoothing", type=str, default="reference",
                        choices=["reference", "fastai"],
                        help="loss smoothing/stop rule (reference = "
                        "lr_finder.py:76-88 parity)")
    parser.add_argument("-net", type=str, required=True, help="network name")
    parser.add_argument("-data", type=str, default=settings.DATA_PATH)
    args = parser.parse_args()

    train_dataset = CamVid(args.data, image_set="train",
                           image_size=settings.IMAGE_SIZE)
    loader = DeviceDataLoader(train_dataset.images, train_dataset.labels,
                              args.b, shuffle=True, drop_last=True)

    # the reference lr_finder pipeline adds RandomScale (lr_finder.py:144-153)
    cfg = AugmentConfig(mean=settings.MEAN, std=settings.STD,
                        rotation_p=0.5, rotation_angle=10,
                        rotation_fill=train_dataset.ignore_index,
                        random_scale=True,
                        scale_fill=train_dataset.ignore_index)
    augment = make_train_augment(cfg)

    init_fn, apply_fn = get_model(args.net, 3, train_dataset.class_num)
    variables = init_fn(jax.random.PRNGKey(0))

    loss, lr = lr_finder(loader, apply_fn, variables,
                         start_lr=args.start_lr, end_lr=args.end_lr,
                         num_it=args.num_it, stop_div=args.stop_div,
                         weight_decay=args.weight_decay,
                         augment_fn=augment, smoothing=args.smoothing)
    plot(loss, lr, skip_start=args.skip_start, skip_end=args.skip_end)
