"""Batch serving CLI: folder -> class maps, through the production
serving stack.

The reference's only inference surface is single-image ``predict.py``
(/root/reference/predict.py:28-57, one process per image, recompiling
every run). This CLI is the batch/production counterpart built on
``pytorch_camvid_tpu.serving.Predictor``: one fixed-shape compiled
forward reused across the whole request, device-side resize +
normalization, bfloat16 compute, uint8 transfers both directions, and a
bounded in-flight pipeline that overlaps H2D / compute / D2H (PERF.md:
end-to-end serving runs at the measured wire capacity of the link).

Usage:
    python serve.py -weight ckpt.npz -input imgs/ -output masks/
        [-net unet] [-b 8] [-c 12] [-color] [-pallas]

Writes ``<stem>_mask.png`` (class indices) and, with ``-color``,
``<stem>_color.png`` (fixed 12-class palette) per input image. Accepts
reference ``.pth`` checkpoints as well as native ``.npz`` (the same
dual-format loading eval.py and predict.py have).
"""

import argparse
import os
import sys
import time

import cv2
import numpy as np


IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"}


def list_images(path: str):
    if os.path.isfile(path):
        return [path]
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if os.path.splitext(f)[1].lower() in IMG_EXTS)
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    return files


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-weight", type=str, required=True,
                        help="checkpoint (.npz) or reference .pth")
    parser.add_argument("-input", type=str, required=True,
                        help="image file or folder")
    parser.add_argument("-output", type=str, required=True,
                        help="output folder for masks")
    parser.add_argument("-net", type=str, default="unet")
    parser.add_argument("-b", type=int, default=8,
                        help="compiled serving batch size")
    parser.add_argument("-c", type=int, default=12, help="class number")
    parser.add_argument("-color", action="store_true",
                        help="also write palette-colorized masks")
    parser.add_argument("-pallas", action="store_true",
                        help="use the fused Pallas serving kernels")
    parser.add_argument("-int8", action="store_true",
                        help="post-training int8 quantization: calibrate "
                             "on the request's first images, then run "
                             "every conv on the MXU int8 path")
    parser.add_argument("-dp", type=int, default=1,
                        help="data-parallel serving over the first N "
                             "local devices (batch must divide by N)")
    args = parser.parse_args(argv)

    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from pytorch_camvid_tpu.serving import Predictor
    from pytorch_camvid_tpu.utils.viz import colorize_mask

    files = list_images(args.input)
    os.makedirs(args.output, exist_ok=True)

    mesh = None
    if args.dp > 1:
        import jax
        from jax.sharding import Mesh
        devices = jax.devices()
        if len(devices) < args.dp:
            raise SystemExit(f"-dp {args.dp} but only {len(devices)} "
                             f"devices visible")
        mesh = Mesh(np.array(devices[:args.dp]), ("data",))

    predictor = Predictor.from_checkpoint(
        args.net, args.weight, batch_size=args.b, num_classes=args.c,
        use_pallas=args.pallas, mesh=mesh)

    images = []
    for f in files:
        img = cv2.imread(f)
        if img is None:
            raise FileNotFoundError(f)
        images.append(img)
    # Predictor resizes uniform stacks on device. Ragged folders are
    # resized per image on host instead (cv2 bilinear, the same resize
    # convention as the device path — ops/resize.py oracle-matches cv2):
    # padding into one max-extent canvas would misalign every smaller
    # image's mask with its content.
    hs = {i.shape[:2] for i in images}
    if len(hs) > 1:
        h, w = predictor.image_hw
        images = [cv2.resize(i, (w, h), interpolation=cv2.INTER_LINEAR)
                  for i in images]
    batch = np.stack(images)

    if args.int8:
        predictor.quantize_int8(batch)

    t0 = time.perf_counter()
    masks = predictor.predict(batch)
    dt = time.perf_counter() - t0

    for f, m in zip(files, masks):
        stem = os.path.splitext(os.path.basename(f))[0]
        cv2.imwrite(os.path.join(args.output, f"{stem}_mask.png"), m)
        if args.color:
            cv2.imwrite(os.path.join(args.output, f"{stem}_color.png"),
                        colorize_mask(m, args.c))
    print(f"served {len(files)} images in {dt:.2f}s "
          f"({len(files) / dt:.1f} img/s) -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
