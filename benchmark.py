"""Data-pipeline throughput benchmark (reference: benchmark.py — iterates
the Python/OpenCV per-sample pipeline and prints samples/sec every 1000).

Here the pipeline is the on-device batched augmentation; the benchmark
measures augmented samples/sec through the jit-fused pipeline (gather +
rotate/blur/flip/jitter/normalize), which is what sits in front of the
model on the hot path."""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.config import settings
from pytorch_camvid_tpu.data import CamVid
from pytorch_camvid_tpu.data.augment import (
    AugmentConfig, make_train_augment)
from pytorch_camvid_tpu.data.synthetic import synthetic_arrays

if __name__ == "__main__":
    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("-b", type=int, default=8, help="batch size")
    parser.add_argument("-data", type=str, default="data")
    parser.add_argument("-epochs", type=int, default=500,
                        help="epochs to iterate (reference: 500)")
    parser.add_argument("-synthetic", action="store_true", default=False,
                        help="use synthetic data (no dataset needed)")
    parser.add_argument("-records", action="store_true", default=False,
                        help="benchmark the record-store decode pipeline "
                        "(the LMDB-parity path: native mmap store + "
                        "cv2.imdecode per sample, legacy/camvid_lmdb.py)")
    args = parser.parse_args()

    if args.records:
        # host-side per-sample decode throughput over the record store
        from pytorch_camvid_tpu.data.camvid_records import CamVidRecords
        from pytorch_camvid_tpu.data.native import native_available
        ds = CamVidRecords(args.data, image_set="train",
                           image_size=settings.IMAGE_SIZE)
        print(f"record store: {len(ds)} records, native lib: "
              f"{native_available()}")
        count, start = 0, time.time()
        for epoch in range(args.epochs):
            for i in range(len(ds)):
                img, lab = ds[i]
                count += 1
                if count % 1000 == 0:
                    t = time.time() - start
                    print("total {} samples, total {:.2f}s, average "
                          "{:.0f} samples/sec".format(count, t, count / t))
            if time.time() - start > 60:
                break
        t = time.time() - start
        print("total {} samples, total {:.2f}s, average {:.0f} samples/sec"
              .format(count, t, count / t))
        raise SystemExit(0)

    if args.synthetic:
        w, h = settings.IMAGE_SIZE
        images, labels = synthetic_arrays(64, hw=(h, w))
    else:
        ds = CamVid(args.data, image_set="train",
                    image_size=settings.IMAGE_SIZE)
        images, labels = ds.images, ds.labels

    d_images = jnp.asarray(images)
    d_labels = jnp.asarray(labels)
    n = images.shape[0]

    cfg = AugmentConfig(mean=settings.MEAN, std=settings.STD,
                        rotation_fill=11, scale_fill=11)
    aug = make_train_augment(cfg)

    @jax.jit
    def pipeline(key, idx):
        x, m = aug(key, jnp.take(d_images, idx, axis=0),
                   jnp.take(d_labels, idx, axis=0))
        return x, m

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # warmup/compile
    x, m = pipeline(key, jnp.asarray(rng.integers(0, n, size=args.b)))
    float(x[0, 0, 0, 0])

    count = 0
    start = time.time()
    for epoch in range(args.epochs):
        for i in range(0, n, args.b):
            key, k = jax.random.split(key)
            x, m = pipeline(k, jnp.asarray(rng.integers(0, n,
                                                        size=args.b)))
            count += args.b
            if count % 1000 < args.b:
                float(x[0, 0, 0, 0])  # sync
                total_time = time.time() - start
                print("total {} samples, total {:.2f}s, average {:.0f} "
                      "samples/sec".format(count, total_time,
                                           count / total_time))
        if time.time() - start > 60:
            break

    float(x[0, 0, 0, 0])
    total_time = time.time() - start
    print("total {} samples, total {:.2f}s, average {:.0f} samples/sec"
          .format(count, total_time, count / total_time))
