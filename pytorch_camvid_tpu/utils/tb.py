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
        """utils.visualize_param_hist (utils.py:43-48) — same TB surface,
        computed ON DEVICE.

        The reference pulls every parameter to host per epoch
        (add_histogram over raw values). Through a remote-attached device
        that one call moved ~138 MB/epoch and measured ~6 s — nearly
        doubling a steady-state epoch (PERF.md round-3). Here a single
        jitted program reduces each leaf to 64 bucket counts + moments
        (~55 KB total) and the histograms are written with
        ``add_histogram_raw``."""
        if self._writer is None:
            return
        import jax
        import jax.numpy as jnp
        if jax.process_count() > 1:
            # multi-process: only the primary logs, and a primary-only jit
            # over cross-process GLOBAL params would desynchronize the SPMD
            # program order across processes — run the same on-device
            # reduction on the LOCAL replica instead (params are fully
            # replicated, so addressable shard 0 is the whole tensor): the
            # jit is then purely local, and only 64 buckets + moments
            # (~55 KB) cross to host, not the ~138 MB of raw params
            params = jax.tree.map(
                lambda l: l.addressable_data(0)
                if hasattr(l, "addressable_data") else l, params)
        if not hasattr(self, "_hist_fn"):
            @jax.jit
            def hist_all(ps):
                out = []
                for leaf in jax.tree_util.tree_leaves(ps):
                    x = leaf.reshape(-1).astype(jnp.float32)
                    mn, mx = jnp.min(x), jnp.max(x)
                    span = jnp.maximum(mx - mn, 1e-12)
                    b = jnp.clip((x - mn) / span * 64.0, 0.0,
                                 63.0).astype(jnp.int32)
                    counts = jnp.bincount(b, length=64)
                    out.append((counts, mn, mx, jnp.sum(x),
                                jnp.sum(x * x)))
                return out
            self._hist_fn = hist_all
        stats = jax.device_get(self._hist_fn(params))
        self._write_hists(params, stats, epoch)

    def _write_hists(self, params, stats, epoch: int):
        import jax
        paths = jax.tree_util.tree_leaves_with_path(params)
        for (path, leaf), (counts, mn, mx, s, ss) in zip(paths, stats):
            name = jax.tree_util.keystr(path).replace("'", "").replace(
                "][", "/").strip("[]")
            mn, mx = float(mn), float(mx)
            limits = np.linspace(mn, mx, 65)[1:]
            self._writer.add_histogram_raw(
                name, min=mn, max=mx, num=int(leaf.size), sum=float(s),
                sum_squares=float(ss), bucket_limits=limits.tolist(),
                bucket_counts=np.asarray(counts).tolist(),
                global_step=epoch)

    def close(self):
        if self._writer is not None:
            self._writer.close()
        elif hasattr(self, "_jsonl"):
            self._jsonl.close()
