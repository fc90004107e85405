"""Running confusion-matrix metrics accumulator (reference:
legacy/metrics.py Metrics class, consumed by eval.py:40-72).

Same API surface — add(preds, gts), precision(), recall(), iou(), clear()
(legacy/metrics.py:32) — but the matrix update is the on-device bincount
reduction (ops/metrics.py) instead of sklearn on CPU; results are bit-equal
to the sklearn path (verified in tests/test_metrics.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pytorch_camvid_tpu.ops.metrics import (
    confusion_matrix, precision_recall_from_confusion, iou_from_confusion)


class Metrics:
    def __init__(self, class_num: int, ignore_index: int | None = None):
        self.class_num = class_num
        self.ignore_index = ignore_index
        self._cm = np.zeros((class_num, class_num), np.float64)

    def add(self, preds, gts):
        """Accumulate a batch (legacy/metrics.py:20-30). Unlike the legacy
        class, ignored labels are dropped at accumulation time; reductions
        below then match the legacy ones, which mask the ignore class out
        when reducing."""
        cm = confusion_matrix(jnp.asarray(preds), jnp.asarray(gts),
                              self.class_num, self.ignore_index)
        self._cm += np.asarray(cm, np.float64)

    def clear(self):
        """Reset the accumulated matrix (legacy/metrics.py:32)."""
        self._cm[:] = 0

    # pre-round-2 name; kept so existing callers don't break
    clear_data = clear

    def _keep(self):
        return [i for i in range(self.class_num) if i != self.ignore_index]

    def precision(self, average: bool = True):
        p, _ = precision_recall_from_confusion(jnp.asarray(self._cm))
        p = np.asarray(p)[self._keep()]
        return float(np.nanmean(p)) if average else p

    def recall(self, average: bool = True):
        _, r = precision_recall_from_confusion(jnp.asarray(self._cm))
        r = np.asarray(r)[self._keep()]
        return float(np.nanmean(r)) if average else r

    def iou(self, average: bool = True):
        i = np.asarray(iou_from_confusion(jnp.asarray(self._cm)))
        i = i[self._keep()]
        return float(np.nanmean(i)) if average else i

    @property
    def matrix(self) -> np.ndarray:
        return self._cm.copy()
