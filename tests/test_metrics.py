"""Golden tests: on-device confusion-matrix metrics vs numpy oracles
reproducing utils.py:162-228 and legacy/metrics.py:20-71."""

import numpy as np
import jax.numpy as jnp

from pytorch_camvid_tpu.ops.metrics import (
    confusion_matrix, intersect_and_union_areas, iou_from_confusion,
    accuracy_from_confusion, precision_recall_from_confusion)


def _oracle_intersect_and_union(pred, label, num_classes, ignore_index):
    # direct transcription of the reference histogram algorithm
    # (utils.py:162-190) as a test oracle
    mask = label != ignore_index
    pred, label = pred[mask], label[mask]
    intersect = pred[pred == label]
    area_intersect, _ = np.histogram(intersect, bins=np.arange(num_classes + 1))
    area_pred, _ = np.histogram(pred, bins=np.arange(num_classes + 1))
    area_label, _ = np.histogram(label, bins=np.arange(num_classes + 1))
    return area_intersect, area_pred + area_label - area_intersect, \
        area_pred, area_label


def test_confusion_matrix_vs_oracle():
    rng = np.random.default_rng(0)
    pred = rng.integers(0, 12, size=(3, 20, 30))
    label = rng.integers(0, 12, size=(3, 20, 30))
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(label),
                                     12, ignore_index=11))
    want = np.zeros((12, 12))
    for p, l in zip(pred.ravel(), label.ravel()):
        if l != 11:
            want[l, p] += 1
    np.testing.assert_array_equal(cm, want)


def test_areas_match_reference_histograms():
    rng = np.random.default_rng(1)
    pred = rng.integers(0, 12, size=(2, 16, 16))
    label = rng.integers(0, 12, size=(2, 16, 16))
    cm = confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 12,
                          ignore_index=11)
    inter, union, parea, larea = (np.asarray(a) for a in
                                  intersect_and_union_areas(cm))
    oi, ou, op, ol = _oracle_intersect_and_union(pred, label, 12, 11)
    # class 11 (ignored labels) differs by construction: the on-device matrix
    # drops ignored labels entirely, while the reference histogram still
    # counts predictions of class 11 at non-ignored pixels — those agree.
    np.testing.assert_array_equal(inter, oi)
    np.testing.assert_array_equal(parea, op)
    np.testing.assert_array_equal(larea, ol)
    np.testing.assert_array_equal(union, ou)


def test_iou_acc_precision_recall():
    # hand-written 3-class case
    pred = np.array([[0, 0, 1, 2, 2, 2]])
    label = np.array([[0, 1, 1, 2, 2, 1]])
    cm = confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 3)
    iou = np.asarray(iou_from_confusion(cm))
    # class1: intersect 1, pred-area 1, label-area 3 -> union 3
    np.testing.assert_allclose(iou, [1 / 2, 1 / 3, 2 / 3])
    all_acc, acc = accuracy_from_confusion(cm)
    np.testing.assert_allclose(float(all_acc), 4 / 6)
    np.testing.assert_allclose(np.asarray(acc), [1.0, 1 / 3, 1.0])
    prec, rec = precision_recall_from_confusion(cm)
    np.testing.assert_allclose(np.asarray(prec), [1 / 2, 1 / 1, 2 / 3])
    np.testing.assert_allclose(np.asarray(rec), [1.0, 1 / 3, 1.0])
