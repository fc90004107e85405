"""Multi-core data-parallel trainer CLI (reference: legacy/train_tpu.py).

The legacy script replicates the model over TPU cores with torch_xla
``dp.DataParallel`` and all-reduces gradients in ``xm.optimizer_step``
(legacy/train_tpu.py:211-225,115). Here the same recipe — SGD(momentum .9,
nesterov, wd 1e-4), per-iteration linear warmup for -warm epochs then
MultiStepLR at settings.MILESTONES — runs as a shard_map over the device
mesh with explicit lax.pmean/psum collectives over ICI."""

import argparse
import time

import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.config import settings
from pytorch_camvid_tpu.data import CamVid
from pytorch_camvid_tpu.data.augment import (
    AugmentConfig, make_train_augment, make_eval_normalize)
from pytorch_camvid_tpu.data.pipeline import DeviceDataLoader
from pytorch_camvid_tpu.models import get_model
from pytorch_camvid_tpu.parallel import make_mesh, batch_sharding
from pytorch_camvid_tpu.parallel.mesh import DATA_AXIS
from pytorch_camvid_tpu.parallel.shard_map_dp import (
    shard_map_train_step, shard_map_eval_step)
from pytorch_camvid_tpu.train import (
    TrainState, sgd, make_train_step, make_eval_step)
from pytorch_camvid_tpu.train.loop import evaluate, print_epoch_metrics
from pytorch_camvid_tpu.train.schedules import warmup_then_multistep

if __name__ == "__main__":
    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("-b", type=int, default=5,
                        help="batch size for dataloader (per replica)")
    parser.add_argument("-lr", type=float, default=0.01,
                        help="initial learning rate")
    parser.add_argument("-e", type=int, default=150, help="training epoches")
    parser.add_argument("-warm", type=int, default=5, help="warm up phase")
    parser.add_argument("-net", type=str, default="unet")
    parser.add_argument("-data", type=str, default=settings.DATA_PATH)
    parser.add_argument("-dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16"])
    args = parser.parse_args()

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    mesh = make_mesh()
    ndev = mesh.shape[DATA_AXIS]
    global_batch = args.b * ndev  # legacy: loader batches round-robin cores
    print(jax.devices()[:ndev])

    train_ds = CamVid(args.data, image_set="train",
                      image_size=settings.IMAGE_SIZE)
    val_ds = CamVid(args.data, image_set="val",
                    image_size=settings.IMAGE_SIZE)

    bsh = batch_sharding(mesh)
    train_loader = DeviceDataLoader(train_ds.images, train_ds.labels,
                                    global_batch, shuffle=True,
                                    drop_last=True, sharding=bsh)
    val_loader = DeviceDataLoader(val_ds.images, val_ds.labels,
                                  global_batch, sharding=bsh)

    iter_per_epoch = len(train_loader)
    schedule = warmup_then_multistep(args.lr, iter_per_epoch * args.warm,
                                     settings.MILESTONES, iter_per_epoch)

    init_fn, apply_fn = get_model(args.net, 3, train_ds.class_num)
    variables = init_fn(jax.random.PRNGKey(0))
    opt = sgd(momentum=0.9, nesterov=True, weight_decay=1e-4)
    state = TrainState.create(variables, opt)

    aug = make_train_augment(
        AugmentConfig(mean=settings.MEAN, std=settings.STD,
                      rotation_fill=train_ds.ignore_index,
                      scale_fill=train_ds.ignore_index),
        compute_dtype=dtype)
    step = make_train_step(apply_fn, opt, schedule, augment_fn=aug,
                           axis_name=DATA_AXIS, compute_dtype=dtype,
                           log_grad_norms=False)
    train_step = shard_map_train_step(step, mesh)
    eval_step = shard_map_eval_step(
        make_eval_step(apply_fn, train_ds.class_num,
                       ignore_index=train_ds.ignore_index,
                       loss_ignore_index=255, axis_name=DATA_AXIS,
                       compute_dtype=dtype), mesh)
    normalize = make_eval_normalize(settings.MEAN, settings.STD, dtype)

    for epoch in range(1, args.e + 1):
        print(f"training epoch {epoch}")
        t1 = time.time()
        for images, masks in train_loader.epoch(epoch - 1):
            state, metrics = train_step(state, (images, masks))
            print("Epoch: {epoch}, devices: {ndev}, loss: {loss:0.4f}, "
                  "lr: {lr:0.6f}".format(epoch=epoch, ndev=ndev,
                                         loss=float(metrics["loss"]),
                                         lr=float(metrics["lr"])))
        print(time.time() - t1)

        loss_sum, cm, _ = evaluate(state, eval_step, val_loader, normalize,
                                   global_batch)
        print_epoch_metrics(cm, train_ds.class_names, train_ds.ignore_index)
