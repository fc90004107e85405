"""Cross-entropy loss (reference: nn.CrossEntropyLoss at train.py:105,
eval.py:42, lr_finder.py:47 — fused log-softmax + NLL).

The reference uses the *unweighted* default with no ignore_index (so the Void
class is trained on; SURVEY.md §2.5.3). We support optional per-class weights
and an ignore_index with torch's exact 'mean' reduction semantics:

    loss = sum_i w[y_i] * nll_i / sum_i w[y_i]      (ignored pixels excluded)

computed fully on device over NHWC logits.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       class_weights: Optional[jax.Array] = None,
                       ignore_index=None) -> jax.Array:
    """Mean cross entropy.

    Args:
      logits: (N, H, W, C) float.
      labels: (N, H, W) int.
      class_weights: optional (C,) float per-class weights.
      ignore_index: optional label value — or tuple of values — excluded
        from the loss (torch supports one; eval needs both the pad sentinel
        255 and a configured ignore class at once).
    """
    logits = logits.astype(jnp.float32)
    c = logits.shape[-1]
    if ignore_index is None:
        ignore = ()
    elif isinstance(ignore_index, (tuple, list, set, frozenset)):
        ignore = tuple(sorted(set(ignore_index)))
    else:
        ignore = (int(ignore_index),)
    logz = jax.nn.logsumexp(logits, axis=-1)
    ignored = jnp.zeros(labels.shape, bool)
    for ig in ignore:
        ignored |= labels == ig
    safe_labels = jnp.where(ignored, 0, labels) if ignore else labels
    # one-hot contraction instead of take_along_axis: the per-pixel gather
    # lowers to a slow scalar gather on TPU (measured 64 ms/step at batch
    # 24x360x480 — nearly the whole forward pass); the one-hot multiply-sum
    # is a regular VPU reduction and numerically identical (0/1 products)
    onehot = jax.nn.one_hot(safe_labels.astype(jnp.int32), c,
                            dtype=logits.dtype)
    picked = jnp.sum(logits * onehot, axis=-1)
    nll = logz - picked

    if class_weights is None:
        w = jnp.ones((), jnp.float32)
        w = jnp.broadcast_to(w, nll.shape)
    else:
        w = jnp.sum(onehot * class_weights.astype(jnp.float32), axis=-1)
    if ignore:
        w = jnp.where(ignored, 0.0, w)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)
