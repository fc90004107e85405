"""jit-fused train / eval steps (reference hot loops: train.py:122-151,
train.py:180-197).

TPU-native design: the whole iteration — optional on-device augmentation,
forward, loss, backward, schedule evaluation, optimizer update, metric
reduction — is one XLA program. Nothing crosses the host boundary per step
except the scalars the caller chooses to log (the reference synced the loss
to host every batch at train.py:136-144 and pulled full predictions to CPU
for metrics at train.py:192; here metrics are a 12x12 matrix).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.ops.loss import cross_entropy_loss
from pytorch_camvid_tpu.ops.metrics import confusion_matrix
from pytorch_camvid_tpu.train.state import TrainState


def head_block(params_or_grads):
    """The output head's conv block — the reference's 'last layer' whose
    grad norms go to TB (utils.py:15-36): UNet's ``output`` block
    (models/unet.py:91) or SegNet's final ``decoder1`` block
    (models/segnet.py:76)."""
    if "output" in params_or_grads:
        return params_or_grads["output"][0]
    if "decoder1" in params_or_grads:
        return params_or_grads["decoder1"][-1]
    raise KeyError("no recognizable head block in params")


def _last_layer_grad_norms(grads):
    """The reference keeps the LAST 'weight'/'bias' in named_parameters
    order (utils.py:15-31); within a conv+BN block the BatchNorm gamma/beta
    come after the conv kernel, so the logged tensors are the head block's
    BN parameters — matched here."""
    blk = head_block(grads)
    return {"grad_norm_w": jnp.linalg.norm(blk["scale"].reshape(-1)),
            "grad_norm_b": jnp.linalg.norm(blk["bias"].reshape(-1))}


def make_train_step(apply_fn, optimizer, lr_schedule,
                    beta1_schedule: Optional[Callable] = None,
                    class_weights=None, ignore_index: Optional[int] = None,
                    augment_fn: Optional[Callable] = None,
                    axis_name: Optional[str] = None,
                    compute_dtype=jnp.float32,
                    log_grad_norms: bool = True,
                    grad_accum: int = 1,
                    remat: bool = False):
    """Build a pure train step: (state, (images, labels)) -> (state, metrics).

    images: float NHWC already normalized, or raw uint8 if augment_fn is
    given (augment_fn(key, images_u8, labels) -> (images_f32, labels)).

    grad_accum > 1 splits the batch into that many microbatches and runs
    them through a ``lax.scan`` (activation memory drops ~grad_accum-fold),
    averaging gradients/losses before the single optimizer update — the
    standard large-effective-batch recipe. BatchNorm normalizes each
    microbatch by its own statistics and the running stats are threaded
    through the scan (the same semantics torch exhibits when calling
    ``backward`` per microbatch and ``step`` once).

    remat=True checkpoints each model stage (models/unet.py::_stage_fn):
    the backward recomputes stage activations instead of storing them —
    the other activation-memory lever, keeping full-batch BN statistics
    where grad_accum changes them to per-microbatch.
    """
    apply_kw = {"remat": True} if remat else {}

    def _grad_one(params, bn_state, images, labels):
        def loss_fn(p):
            logits, new_bn = apply_fn(
                {"params": p, "state": bn_state}, images,
                train=True, axis_name=axis_name,
                compute_dtype=compute_dtype, **apply_kw)
            loss = cross_entropy_loss(logits, labels, class_weights,
                                      ignore_index)
            return loss, new_bn
        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def step_fn(state: TrainState, batch):
        images, labels = batch
        rng, key = jax.random.split(state.rng)
        if augment_fn is not None:
            if axis_name is not None:
                # decorrelate per-shard augmentation draws under shard_map
                key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
            images, labels = augment_fn(key, images, labels)
        labels = labels.astype(jnp.int32)

        if grad_accum > 1:
            n = images.shape[0]
            assert n % grad_accum == 0, (
                f"batch {n} must divide grad_accum {grad_accum}")
            mb = n // grad_accum
            im_s = images.reshape((grad_accum, mb) + images.shape[1:])
            lb_s = labels.reshape((grad_accum, mb) + labels.shape[1:])

            def scan_body(carry, xs):
                bn, acc_loss, acc_grads = carry
                mb_im, mb_lb = xs
                (loss, new_bn), grads = _grad_one(state.params, bn,
                                                  mb_im, mb_lb)
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                return (new_bn, acc_loss + loss, acc_grads), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (new_bn, loss, grads), _ = jax.lax.scan(
                scan_body, (state.bn_state, jnp.float32(0.0), zero_grads),
                (im_s, lb_s))
            inv = 1.0 / grad_accum
            loss = loss * inv
            grads = jax.tree.map(lambda g: g * inv, grads)
        else:
            (loss, new_bn), grads = _grad_one(state.params, state.bn_state,
                                              images, labels)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)

        lr = lr_schedule(state.step)
        beta1 = (beta1_schedule(state.step) if beta1_schedule is not None
                 else jnp.asarray(0.9, jnp.float32))
        new_params, new_opt = optimizer.update(
            grads, state.opt_state, state.params, state.step, lr, beta1)

        metrics = {"loss": loss, "lr": lr, "beta1": beta1}
        if log_grad_norms:
            metrics.update(_last_layer_grad_norms(grads))

        new_state = TrainState(params=new_params, bn_state=new_bn,
                               opt_state=new_opt, step=state.step + 1,
                               rng=rng)
        return new_state, metrics

    return step_fn


def make_eval_step(apply_fn, num_classes: int,
                   ignore_index: Optional[int] = None, class_weights=None,
                   loss_ignore_index: Optional[int] = None,
                   axis_name: Optional[str] = None,
                   compute_dtype=jnp.float32):
    """Build a pure eval step returning (loss_sum, confusion_matrix).

    The confusion matrix is the single on-device reduction from which mIOU /
    acc / precision / recall derive (legacy/metrics.py unified with
    utils.py:162-228). Under data parallelism the matrix is psum-reduced.
    """

    def step_fn(state: TrainState, batch):
        images, labels = batch
        labels = labels.astype(jnp.int32)
        logits, _ = apply_fn(state.variables(), images, train=False,
                             compute_dtype=compute_dtype)
        loss = cross_entropy_loss(logits, labels, class_weights,
                                  loss_ignore_index)
        preds = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(preds, labels, num_classes, ignore_index)
        if axis_name is not None:
            loss = jax.lax.pmean(loss, axis_name)
            cm = jax.lax.psum(cm, axis_name)
        return loss, cm

    return step_fn
