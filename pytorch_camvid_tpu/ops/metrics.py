"""On-device segmentation metrics.

The reference has two metric paths (SURVEY.md §5.5):
- histogram ``intersect_and_union``/``mean_iou`` (utils.py:162-228) used in
  the training loop,
- confusion-matrix ``Metrics`` (legacy/metrics.py:20-71, sklearn, CPU) used
  by eval.py — the path matching the published 0.6296/0.5913 mIOU.

TPU-native design: one CxC confusion-matrix reduction on device (a bincount
over label*C + pred, i.e. a one-hot matmul XLA maps to the MXU/VPU), summed
across batches and ``psum``-reduced across data-parallel replicas. IoU,
accuracy, precision and recall all derive from it, unifying both reference
paths. The histogram quantities are derived from the same matrix, so the
training-loop metric surface (utils.py:193-228) is served too.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def confusion_matrix(preds: jax.Array, labels: jax.Array, num_classes: int,
                     ignore_index: Optional[int] = None) -> jax.Array:
    """CxC confusion matrix; rows = ground truth, cols = prediction.

    Pixels whose *label* equals ignore_index are dropped (matching
    utils.py:178; legacy/metrics.py keeps them in the matrix but excludes the
    ignore class when reducing — with row/col masking both agree).
    """
    p = preds.reshape(-1).astype(jnp.int32)
    l = labels.reshape(-1).astype(jnp.int32)
    # labels outside [0, C) are always dropped (used by the eval loop to pad
    # ragged final batches with label=255 sentinels)
    valid = (l >= 0) & (l < num_classes)
    if ignore_index is not None:
        valid &= l != ignore_index
    flat = jnp.where(valid, l * num_classes + p, num_classes * num_classes)
    cm = jnp.bincount(flat, length=num_classes * num_classes + 1)[:-1]
    return cm.reshape(num_classes, num_classes).astype(jnp.float64
        if jax.config.jax_enable_x64 else jnp.float32)


def intersect_and_union_areas(cm: jax.Array) -> Tuple[jax.Array, jax.Array,
                                                      jax.Array, jax.Array]:
    """Derive (intersect, union, pred_area, label_area) histograms from a
    confusion matrix — the quantities of utils.py:162-190."""
    intersect = jnp.diagonal(cm)
    pred_area = jnp.sum(cm, axis=0)
    label_area = jnp.sum(cm, axis=1)
    union = pred_area + label_area - intersect
    return intersect, union, pred_area, label_area


def iou_from_confusion(cm: jax.Array) -> jax.Array:
    """Per-class IoU = diag / (row + col - diag) (legacy/metrics.py:61-71)."""
    inter, union, _, _ = intersect_and_union_areas(cm)
    return inter / union


def accuracy_from_confusion(cm: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(all_acc, per-class acc) as in utils.py:222-223."""
    inter, _, _, label_area = intersect_and_union_areas(cm)
    all_acc = jnp.sum(inter) / jnp.sum(label_area)
    return all_acc, inter / label_area


def precision_recall_from_confusion(cm: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-class (precision, recall) (legacy/metrics.py:35-59)."""
    inter, _, pred_area, label_area = intersect_and_union_areas(cm)
    return inter / pred_area, inter / label_area
