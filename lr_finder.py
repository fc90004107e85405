"""LR range finder CLI (reference: lr_finder.py — fastai-style sweep).

Runs up to -num_it batches with the geometric ExponentialLR sweep
(lr_scheduler/ExponentialLR.py), exponential loss smoothing (beta=0.98,
lr_finder.py:86-88), divergence stop when smoothed loss > 4x best
(lr_finder.py:76-78), then saves a log-x loss-vs-lr curve to
``lr_finder.jpeg``. The reference's closure-over-globals bug
(lr_finder.py:46,54,63) is fixed by passing parameters explicitly."""

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
              stop_div, weight_decay, augment_fn, smooth_f=0.05, beta=0.98):
    """LR range test (lr_finder.py:17-96). Returns (losses, lrs)."""
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
            lrs.append(float(metrics["lr"]))
            it += 1
            # exponential smoothing (lr_finder.py:86-88)
            avg_loss = beta * avg_loss + (1 - beta) * loss
            smoothed = avg_loss / (1 - beta ** it)
            losses.append(smoothed)
            best_loss = smoothed if best_loss is None else min(best_loss,
                                                               smoothed)
            print(f"iter {it}/{num_it} lr {lrs[-1]:.3e} "
                  f"loss {smoothed:.4f}")
            if stop_div and (smoothed > 4 * best_loss or np.isnan(smoothed)):
                print("Stopping early, the loss has diverged")
                return np.asarray(losses), np.asarray(lrs)
    return np.asarray(losses), np.asarray(lrs)


def plot(loss, lr, skip_start=10, skip_end=5, image_name="lr_finder.jpeg"):
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
                         augment_fn=augment)
    plot(loss, lr, skip_start=args.skip_start, skip_end=args.skip_end)
