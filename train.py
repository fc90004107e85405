"""Train CLI (reference: train.py).

Same flag surface (-b, -lr, -e, -wd, -resume, -net, -download) plus
TPU-native extras (-data, -dataset, -dtype, -dp, -seed, -quiet,
-image_size). The loop itself lives in pytorch_camvid_tpu.train.loop (the
reference keeps it inline, train.py:116-240). -dataset voc2012 trains the
augmented Pascal VOC2012 set (reference capability dataset/voc2012.py, which
its train.py never wires up) with the VOC normalization stats
(conf/settings.py:3-5) and the 255 ignore label excluded from the loss.
"""

import argparse
import dataclasses
import os

from pytorch_camvid_tpu.config import settings
from pytorch_camvid_tpu.data import CamVid
from pytorch_camvid_tpu.train.loop import TrainConfig, run_training
from pytorch_camvid_tpu.utils import SummaryLogger

if __name__ == "__main__":
    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("-b", type=int, default=10,
                        help="batch size for dataloader")
    parser.add_argument("-lr", type=float, default=5e-4,
                        help="initial learning rate")
    parser.add_argument("-e", type=int, default=120, help="training epoches")
    parser.add_argument("-wd", type=float, default=0, help="weight decay")
    # the reference declares -resume as type=bool (always truthy for any
    # string, SURVEY.md §2.5.10); a store_true flag is the intended behavior
    parser.add_argument("-resume", action="store_true", default=False,
                        help="if resume training")
    parser.add_argument("-net", type=str, required=True, help="network name")
    parser.add_argument("-download", action="store_true", default=False,
                        help="whether to download camvid dataset")
    parser.add_argument("-data", type=str, default="data",
                        help="dataset root folder")
    parser.add_argument("-dataset", type=str, default="camvid",
                        choices=["camvid", "voc2012"],
                        help="dataset to train on")
    # float32 matches the reference recipe's numerics; pass -dtype bfloat16
    # explicitly for ~2x MXU throughput on TPU
    parser.add_argument("-dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="compute dtype on device (float32 = reference "
                        "numerics; bfloat16 = fast TPU path)")
    parser.add_argument("-dp", type=int, default=0,
                        help="data-parallel devices (0 = all)")
    parser.add_argument("-seed", type=int, default=0)
    parser.add_argument("-quiet", action="store_true", default=False)
    parser.add_argument("-image_size", type=int, nargs=2, default=None,
                        metavar=("W", "H"),
                        help="working size in cv2 (W, H) order; default "
                        "settings.IMAGE_SIZE = (480, 360)")
    parser.add_argument("-remat", action="store_true", default=False,
                        help="rematerialize (jax.checkpoint) each model "
                             "stage: backward recomputes activations — "
                             "fits larger batches in HBM with full-batch "
                             "BN statistics (unlike -accum)")
    parser.add_argument("-accum", type=int, default=1,
                        help="gradient-accumulation microbatches per step "
                        "(batch must divide; lowers activation memory)")
    parser.add_argument("-loader", type=str, default="device",
                        choices=["device", "host"],
                        help="input pipeline: device = HBM-resident split "
                        "(default); host = host-RAM + native threaded "
                        "gather + double-buffered H2D (for > HBM splits)")
    parser.add_argument("-chain", type=int, default=8,
                        help="train steps dispatched per host round-trip "
                        "(lax.scan-chained; device loader only; 1 = "
                        "step-per-dispatch like the reference loop)")
    parser.add_argument("-multihost", action="store_true", default=False,
                        help="initialize the JAX distributed runtime for "
                        "multi-process (pod) training: auto-detects TPU "
                        "pod metadata, or set PCT_COORDINATOR / "
                        "PCT_NUM_PROCS / PCT_PROC_ID; process 0 owns "
                        "console/TB/checkpoint writes")
    args = parser.parse_args()
    primary = True
    if args.multihost:
        # must run before any other jax use (the backend freezes at first
        # device query); every process then sees the GLOBAL device mesh
        from pytorch_camvid_tpu.parallel import init_distributed
        pidx, pcnt = init_distributed()
        primary = pidx == 0
        print(f"multihost: process {pidx}/{pcnt}")
    image_size = (tuple(args.image_size) if args.image_size
                  else settings.IMAGE_SIZE)

    # cwd-relative like the reference (train.py:36-45 joins the bare
    # 'checkpoints'/'runs' folder names)
    checkpoint_path = os.path.join(settings.CHECKPOINT_FOLDER,
                                   settings.TIME_NOW)
    log_dir = os.path.join(settings.LOG_FOLDER, settings.TIME_NOW)
    if primary:
        # multihost: only process 0 owns checkpoints/TB — creating dirs on
        # every process would strew per-process TIME_NOW folders (and TB
        # event files) across a shared filesystem
        os.makedirs(checkpoint_path, exist_ok=True)
        os.makedirs(log_dir, exist_ok=True)

    loss_ignore = None
    if args.dataset == "voc2012":
        from pytorch_camvid_tpu.data import VOC2012Aug
        train_dataset = VOC2012Aug(args.data, image_set="train",
                                   image_size=image_size)
        valid_dataset = VOC2012Aug(args.data, image_set="val",
                                   image_size=image_size)
        settings = dataclasses.replace(settings, MEAN=settings.VOC_MEAN,
                                       STD=settings.VOC_STD)
        loss_ignore = train_dataset.ignore_index  # 255 (letterbox pad too)
    else:
        train_dataset = CamVid(args.data, image_set="train",
                               download=args.download,
                               image_size=image_size)
        valid_dataset = CamVid(args.data, image_set="val",
                               download=args.download,
                               image_size=image_size)
    print()

    cfg = TrainConfig(
        net=args.net, batch_size=args.b, lr=args.lr, epochs=args.e,
        weight_decay=args.wd, resume=args.resume, seed=args.seed,
        compute_dtype=args.dtype, data_parallel=args.dp,
        checkpoint_dir=checkpoint_path, log_dir=log_dir, quiet=args.quiet,
        save_epoch=settings.SAVE_EPOCH, loss_ignore_index=loss_ignore,
        loader=args.loader, grad_accum=args.accum, remat=args.remat,
        dispatch_chain=args.chain)

    logger = SummaryLogger(log_dir) if primary else None
    try:
        run_training(cfg, train_dataset, valid_dataset, settings=settings,
                     logger=logger)
    finally:
        if logger is not None:
            logger.close()
