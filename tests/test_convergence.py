"""End-to-end convergence smoke test: UNet learns the synthetic
color->class mapping to a meaningful mIOU in a few dozen steps. This is the
dataset-free stand-in for the full CamVid recipe (the real tarball needs
network access; SURVEY.md §6 mIOU parity runs on real hardware + data)."""

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.data.synthetic import synthetic_arrays
from pytorch_camvid_tpu.models import get_model
from pytorch_camvid_tpu.ops.metrics import iou_from_confusion
from pytorch_camvid_tpu.train import (
    TrainState, adamw, make_train_step, make_eval_step, onecycle_lr,
    onecycle_beta1)


def test_unet_reaches_nontrivial_miou():
    images, labels = synthetic_arrays(8, (48, 64), num_classes=6)
    x = (jnp.asarray(images, jnp.float32) / 255.0 - 0.4) / 0.3
    y = jnp.asarray(labels, jnp.int32)

    init_fn, apply_fn = get_model("unet", 3, 6)
    variables = init_fn(jax.random.PRNGKey(0))
    opt = adamw()
    steps = 40
    step_fn = jax.jit(make_train_step(
        apply_fn, opt, onecycle_lr(2e-3, steps), onecycle_beta1(steps),
        log_grad_norms=False), donate_argnums=0)
    state = TrainState.create(variables, opt)
    for _ in range(steps):
        state, m = step_fn(state, (x, y))
    assert np.isfinite(float(m["loss"]))

    eval_fn = jax.jit(make_eval_step(apply_fn, 6))
    _, cm = eval_fn(state, (x, y))
    iou = np.asarray(iou_from_confusion(cm))
    miou = float(np.nanmean(iou))
    # untrained mIOU is ~0.03 (1/6 accuracy with 6 classes); learned
    # structure must clear it by a wide margin
    assert miou > 0.35, f"mIOU {miou} too low; loss {float(m['loss'])}"
