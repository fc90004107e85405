"""Eval CLI (reference: eval.py — which ships with broken imports,
SURVEY.md §2.5.8; this one works).

Loads a checkpoint, runs the validation set, prints mIOU / precision /
recall / loss from the on-device confusion matrix (the reference uses the
sklearn-backed legacy/metrics.py Metrics class on CPU)."""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.config import settings
from pytorch_camvid_tpu.data import CamVid
from pytorch_camvid_tpu.data.augment import make_eval_normalize
from pytorch_camvid_tpu.data.pipeline import DeviceDataLoader
from pytorch_camvid_tpu.models import get_model
from pytorch_camvid_tpu.ops.metrics import (
    iou_from_confusion, precision_recall_from_confusion)
from pytorch_camvid_tpu.train import TrainState, adamw, make_eval_step
from pytorch_camvid_tpu.train.checkpoint import load_checkpoint
from pytorch_camvid_tpu.train.loop import evaluate

if __name__ == "__main__":
    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("-weight", type=str, required=True,
                        help="weight file path")
    parser.add_argument("-b", type=int, default=10,
                        help="batch size for dataloader")
    parser.add_argument("-net", type=str, default="unet",
                        help="network name")
    parser.add_argument("-data", type=str, default=settings.DATA_PATH,
                        help="dataset root folder")
    parser.add_argument("-pallas", action="store_true", default=False,
                        help="use the fused Pallas serving kernels")
    parser.add_argument("-int8", action="store_true", default=False,
                        help="post-training int8 quantization: calibrate "
                             "on the first 4 val batches, then run every "
                             "conv on the MXU int8 path (ops/quant.py)")
    parser.add_argument("-image_size", type=int, nargs=2, default=None,
                        metavar=("W", "H"),
                        help="working size in cv2 (W, H) order; default "
                        "settings.IMAGE_SIZE")
    parser.add_argument("-dataset", type=str, default="camvid",
                        choices=["camvid", "voc2012"],
                        help="dataset to evaluate on")
    parser.add_argument("-dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="compute dtype on device (same knob as "
                             "train.py -dtype)")
    args = parser.parse_args()
    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" \
        else jnp.float32

    image_size = (tuple(args.image_size) if args.image_size
                  else settings.IMAGE_SIZE)
    mean, std = settings.MEAN, settings.STD
    if args.dataset == "voc2012":
        from pytorch_camvid_tpu.data import VOC2012Aug
        valid_dataset = VOC2012Aug(args.data, image_set="val",
                                   image_size=image_size)
        mean, std = settings.VOC_MEAN, settings.VOC_STD
    else:
        valid_dataset = CamVid(args.data, image_set="val",
                               image_size=image_size)

    init_fn, apply_fn = get_model(args.net, 3, valid_dataset.class_num)
    variables = init_fn(jax.random.PRNGKey(0))
    opt = adamw()
    template = TrainState.create(variables, opt)
    if args.weight.endswith(".pth"):
        # reference torch checkpoint (train.py:234) via weight transfer
        from pytorch_camvid_tpu.interop import load_torch_checkpoint
        v = load_torch_checkpoint(args.weight, args.net, variables)
        state = TrainState(params=v["params"], bn_state=v["state"],
                           opt_state=template.opt_state,
                           step=template.step, rng=template.rng)
    else:
        state, meta = load_checkpoint(args.weight, template)

    if args.int8:
        from pytorch_camvid_tpu.ops.quant import (calibrate,
                                                  quantize_variables)
        calib_loader = DeviceDataLoader(valid_dataset.images,
                                        valid_dataset.labels, args.b)
        calib_norm = make_eval_normalize(mean, std, compute_dtype)
        batches = []
        for images_u8, _ in calib_loader.epoch(0):
            batches.append(calib_norm(images_u8))
            if len(batches) >= 4:
                break
        v = {"params": state.params, "state": state.bn_state}
        qv = quantize_variables(v, calibrate(apply_fn, v, batches,
                                             compute_dtype=compute_dtype))
        state = TrainState(params=qv["params"], bn_state=qv["state"],
                           opt_state=state.opt_state, step=state.step,
                           rng=state.rng)

    if args.pallas:
        print("note: -pallas compiles every conv block as a Mosaic kernel "
              "in one program; some remote-compile environments (axon "
              "tunnel) cannot handle whole-model kernel counts — see "
              "ops/pallas_conv.py")
        base_apply = apply_fn
        apply_fn = (lambda v, x, **kw:
                    base_apply(v, x, **{**kw, "use_pallas": True}))
    eval_fn = jax.jit(make_eval_step(
        apply_fn, valid_dataset.class_num,
        ignore_index=valid_dataset.ignore_index, loss_ignore_index=255,
        compute_dtype=compute_dtype))
    loader = DeviceDataLoader(valid_dataset.images, valid_dataset.labels,
                              args.b)
    normalize = make_eval_normalize(mean, std, compute_dtype)

    loss_sum, cm, n_batches = evaluate(state, eval_fn, loader, normalize,
                                       args.b)
    cmj = jnp.asarray(cm)
    iou = np.asarray(iou_from_confusion(cmj))
    precision, recall = (np.asarray(a) for a in
                         precision_recall_from_confusion(cmj))

    ig = valid_dataset.ignore_index
    keep = [i for i in range(valid_dataset.class_num) if i != ig]
    print("Iou for each class:")
    print(", ".join(f"{n}:{v:.4f}" for n, v in
                    zip(valid_dataset.class_names, iou)))
    print(f"miou: {np.nanmean(iou[keep]):.4f}")
    print(f"precision: {np.nanmean(precision[keep]):.4f}")
    print(f"recall: {np.nanmean(recall[keep]):.4f}")
    # per-batch normalization like the reference (eval.py:68)
    print(f"loss: {loss_sum / max(n_batches, 1):.4f}")
