"""TensorBoard logging (reference: utils.py:10-48 + train.py TB calls).

Writes the same scalar tags the reference does (Train/LearningRate,
Train/Beta1, Test/mIOU, Test/Acc, Test/Loss, LastLayerGradients/grad_norm2_*
and parameter histograms). Degrades to a JSONL event log when the
tensorboard writer is unavailable, so headless runs still record metrics.
"""

from __future__ import annotations

import json
import os
import time
import numpy as np


class SummaryLogger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._writer = SummaryWriter(log_dir=log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "events.jsonl"), "a")

    def scalar(self, tag: str, value, step: int):
        v = float(value)
        if self._writer is not None:
            self._writer.add_scalar(tag, v, step)
        else:
            self._jsonl.write(json.dumps(
                {"ts": time.time(), "tag": tag, "value": v,
                 "step": int(step)}) + "\n")
            self._jsonl.flush()

    def last_layer_grad_norms(self, norms: dict, n_iter: int):
        """utils.visulaize_lastlayer (utils.py:33-36) tag surface."""
        if "grad_norm_w" in norms:
            self.scalar("LastLayerGradients/grad_norm2_weights",
                        norms["grad_norm_w"], n_iter)
        if "grad_norm_b" in norms:
            self.scalar("LastLayerGradients/grad_norm2_bias",
                        norms["grad_norm_b"], n_iter)

    def param_histograms(self, params, epoch: int):
        """utils.visualize_param_hist (utils.py:43-48)."""
        if self._writer is None:
            return
        import jax
        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            name = jax.tree_util.keystr(path).replace("'", "").replace(
                "][", "/").strip("[]")
            self._writer.add_histogram(name, np.asarray(leaf), epoch)

    def close(self):
        if self._writer is not None:
            self._writer.close()
        elif hasattr(self, "_jsonl"):
            self._jsonl.close()
