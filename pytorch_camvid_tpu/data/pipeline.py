"""Input pipeline: the whole dataset lives in device HBM as uint8.

Reference: torch DataLoader with 4 worker processes decoding + augmenting
per sample in Python/OpenCV (train.py:80-84) — SURVEY.md §3.1 hot loop #1
and the measured bottleneck (benchmark.py).

TPU-native redesign: CamVid at 360x480 is ~250 MB uint8 (images + masks).
It is transferred to the device ONCE; each step gathers a batch by indices
on device and the (jit-fused) augmentation produces normalized tensors.
Host work per step is: advancing an index permutation. There are no worker
processes, no per-sample Python, no per-step H2D transfer.

For datasets that exceed HBM (e.g. VOC2012 at full size), ``HostLoader``
streams batches with double buffering (device_put of batch t+1 overlaps the
step on batch t).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class DeviceDataLoader:
    """Batches gathered on device from HBM-resident arrays.

    Yields (images_u8 (B,H,W,3), labels_u8 (B,H,W)) device arrays. With
    drop_last=False the trailing partial batch is emitted at its natural
    (smaller) static shape, costing one extra compilation, like the
    reference DataLoader's final batch (train.py:80-84 uses the default
    drop_last=False).
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 batch_size: int, shuffle: bool = False, seed: int = 0,
                 drop_last: bool = False, sharding=None,
                 pad_to_batch: bool = False, pad_label: int = 255):
        # pad_to_batch: pad the split up to a batch_size multiple with
        # sentinel-label rows INCLUDED in iteration, so every batch has the
        # full static shape (multi-process eval: host-side ragged-batch
        # padding would need eager ops on a non-addressable global array).
        # The 255 sentinel is dropped by both the eval loss and the
        # confusion matrix, same as the loop's _pad_batch.
        if pad_to_batch:
            pad = (-images.shape[0]) % batch_size
            if pad:
                images = np.concatenate(
                    [images, np.zeros((pad,) + images.shape[1:],
                                      images.dtype)])
                labels = np.concatenate(
                    [labels,
                     np.full((pad,) + labels.shape[1:], pad_label,
                             labels.dtype)])
        if sharding is not None:
            # sample-axis sharding needs n % n_devices == 0; pad with rows
            # that the index permutation never touches
            pad = (-images.shape[0]) % sharding.mesh.size
            if pad:
                images = np.concatenate(
                    [images, np.zeros((pad,) + images.shape[1:],
                                      images.dtype)])
                labels = np.concatenate(
                    [labels, np.zeros((pad,) + labels.shape[1:],
                                      labels.dtype)])
            from pytorch_camvid_tpu.parallel.multihost import put_global
            self.images = put_global(images, sharding)
            self.labels = put_global(labels, sharding)
            self.n = images.shape[0] - pad
        else:
            self.images = jnp.asarray(images)
            self.labels = jnp.asarray(labels)
            self.n = images.shape[0]
        self._sharding = sharding
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0
        # multi-process: eager jnp.take on a cross-process global array is
        # illegal — gather through a jitted program with an explicit
        # batch-sharded output instead
        self._jit_gather = None
        if sharding is not None and jax.process_count() > 1:
            self._jit_gather = jax.jit(
                lambda im, lb, ix: (jnp.take(im, ix, axis=0),
                                    jnp.take(lb, ix, axis=0)),
                out_shardings=(sharding, sharding))

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch: Optional[int] = None) -> Iterator[Tuple]:
        e = self._epoch if epoch is None else epoch
        self._epoch = e + 1
        if self.shuffle:
            perm = np.random.default_rng(self.seed + e).permutation(self.n)
        else:
            perm = np.arange(self.n)
        b = self.batch_size
        stop = self.n - self.n % b if self.drop_last else self.n
        for i in range(0, stop, b):
            if self._jit_gather is not None:
                yield self._jit_gather(self.images, self.labels,
                                       perm[i: i + b])
                continue
            idx = jnp.asarray(perm[i: i + b])
            im = jnp.take(self.images, idx, axis=0)
            lb = jnp.take(self.labels, idx, axis=0)
            if self._sharding is not None and \
                    im.shape[0] % self._sharding.mesh.size == 0:
                # gathers don't preserve the batch sharding; re-pin so the
                # jit'ed step's in_shardings match (ragged final batches
                # stay unpinned — the consumer pads then pins)
                im = jax.device_put(im, self._sharding)
                lb = jax.device_put(lb, self._sharding)
            yield (im, lb)

    def epoch_indices(self, epoch: Optional[int] = None) -> np.ndarray:
        """The epoch's batch-index plan as a (steps, batch) int array —
        the same permutation ``epoch()`` would consume, for callers that
        fuse the gather into a chained (lax.scan) dispatch instead of
        gathering per batch (train/loop.py). Full batches only (the ragged
        tail, when drop_last=False, is not chainable at a fixed shape)."""
        e = self._epoch if epoch is None else epoch
        self._epoch = e + 1
        if self.shuffle:
            perm = np.random.default_rng(self.seed + e).permutation(self.n)
        else:
            perm = np.arange(self.n)
        steps = self.n // self.batch_size
        return perm[: steps * self.batch_size].reshape(
            steps, self.batch_size)

    def __iter__(self):
        return self.epoch()


class HostLoader:
    """Fallback for > HBM datasets: host arrays, double-buffered H2D.

    The per-batch index gather runs through the native threaded gather
    (native/loader.cpp via data.native.gather_batch; numpy fallback when
    the toolchain is absent) — this is the DataLoader-worker replacement
    for the host-fed path, reachable from the CLI via
    ``train.py -loader host``."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 batch_size: int, shuffle: bool = False, seed: int = 0,
                 drop_last: bool = False, sharding=None):
        self.images, self.labels = images, labels
        self.n = images.shape[0]
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.sharding = sharding
        self._epoch = 0

    def __len__(self):
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch: Optional[int] = None):
        from pytorch_camvid_tpu.data.native import gather_batch
        e = self._epoch if epoch is None else epoch
        self._epoch = e + 1
        perm = (np.random.default_rng(self.seed + e).permutation(self.n)
                if self.shuffle else np.arange(self.n))
        stop = self.n - self.n % self.batch_size if self.drop_last \
            else self.n

        def put(lo):
            idx = perm[lo: lo + self.batch_size]
            im = gather_batch(self.images, idx)
            lb = gather_batch(self.labels, idx)
            if self.sharding is not None and \
                    im.shape[0] % self.sharding.mesh.size == 0:
                # ragged final batches stay unpinned — the consumer pads
                # then pins (same contract as DeviceDataLoader)
                return (jax.device_put(im, self.sharding),
                        jax.device_put(lb, self.sharding))
            return jnp.asarray(im), jnp.asarray(lb)

        nxt = put(0) if stop else None
        for lo in range(0, stop, self.batch_size):
            cur = nxt
            nxt_lo = lo + self.batch_size
            nxt = put(nxt_lo) if nxt_lo < stop else None  # overlap H2D
            yield cur

    def __iter__(self):
        return self.epoch()
