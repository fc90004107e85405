"""Train CLI (reference: train.py).

Same flag surface (-b, -lr, -e, -wd, -resume, -net, -download) plus
TPU-native extras (-data, -dtype, -dp, -seed, -quiet). The loop itself lives
in pytorch_camvid_tpu.train.loop (the reference keeps it inline,
train.py:116-240).
"""

import argparse
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
    args = parser.parse_args()
    image_size = (tuple(args.image_size) if args.image_size
                  else settings.IMAGE_SIZE)

    root_path = os.path.dirname(os.path.abspath(__file__))
    checkpoint_path = os.path.join(root_path, settings.CHECKPOINT_FOLDER,
                                   settings.TIME_NOW)
    log_dir = os.path.join(root_path, settings.LOG_FOLDER, settings.TIME_NOW)
    os.makedirs(checkpoint_path, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)

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
        save_epoch=settings.SAVE_EPOCH)

    logger = SummaryLogger(log_dir)
    try:
        run_training(cfg, train_dataset, valid_dataset, settings=settings,
                     logger=logger)
    finally:
        logger.close()
