"""Predict CLI (reference: predict.py): single-image inference.

Reads an image, resizes to the working size, runs the model, argmaxes and
nearest-resizes the class-index map back to the source size, writes
``src.jpg`` and ``predict.jpg`` (predict.py:55-57). The reference writes the
raw class-index image (SURVEY.md §2.5.9); we additionally write
``predict_color.png`` with a fixed 12-class palette so the output is
human-viewable."""

import argparse

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.config import settings
from pytorch_camvid_tpu.data.augment import make_eval_normalize
from pytorch_camvid_tpu.models import get_model
from pytorch_camvid_tpu.train import TrainState, adamw
from pytorch_camvid_tpu.train.checkpoint import load_checkpoint
from pytorch_camvid_tpu.utils.viz import colorize_mask

if __name__ == "__main__":
    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("-img", type=str, required=True,
                        help="image path to predict")
    parser.add_argument("-weight", type=str, required=True,
                        help="weight file path")
    parser.add_argument("-c", type=int, default=12, help="class number")
    parser.add_argument("-net", type=str, default="unet",
                        help="network name")
    args = parser.parse_args()

    src = cv2.imread(args.img)
    if src is None:
        raise FileNotFoundError(args.img)
    w, h = settings.IMAGE_SIZE
    image = cv2.resize(src, (w, h))

    init_fn, apply_fn = get_model(args.net, 3, args.c)
    variables = init_fn(jax.random.PRNGKey(0))
    template = TrainState.create(variables, adamw())
    if args.weight.endswith(".pth"):
        # reference torch checkpoint (train.py:234) via weight transfer
        from pytorch_camvid_tpu.interop import load_torch_checkpoint
        v = load_torch_checkpoint(args.weight, args.net, variables)
        state = TrainState(params=v["params"], bn_state=v["state"],
                           opt_state=template.opt_state,
                           step=template.step, rng=template.rng)
    else:
        state, _ = load_checkpoint(args.weight, template)

    normalize = make_eval_normalize(settings.MEAN, settings.STD)
    x = normalize(jnp.asarray(image)[None])

    logits, _ = jax.jit(
        lambda v, x: apply_fn(v, x, train=False))(state.variables(), x)
    preds = np.asarray(jnp.argmax(logits, axis=-1))[0].astype(np.uint8)

    preds = cv2.resize(preds, src.shape[:2][::-1],
                       interpolation=cv2.INTER_NEAREST)
    cv2.imwrite("src.jpg", src)
    cv2.imwrite("predict.jpg", preds)
    cv2.imwrite("predict_color.png", colorize_mask(preds, args.c))
    print(f"wrote src.jpg, predict.jpg, predict_color.png "
          f"(classes present: {sorted(np.unique(preds).tolist())})")
