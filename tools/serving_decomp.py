"""Decompose end-to-end serving throughput per stage and per strategy.

VERDICT r3 weak #3/#4: UNet end-to-end serving fell 73.0 -> 57.1 img/s
between BENCH_r02 and BENCH_r03, and SegNet e2e sits at 58% of UNet's with
compute-only throughput essentially equal. This tool measures, on the real
chip, everything needed to locate both:

1. stage floors: H2D-only (uint8 batch up), D2H-only (uint8 mask down),
   compute-only (device-resident, blocked) — each per model where relevant;
2. the full Predictor.predict pipeline under a strategy grid:
   in-flight window x {sync drain, async host copy} x request size
   (120 vs 240 images — BENCH_r03 ran SegNet at 120, half UNet's 240,
   which halves pipeline-ramp amortization).

Timing rule (tools/perf_probe.py): never time a single dispatch through
the tunnel; every row is a blocked loop over >= 5 batches.

Writes JSONL rows to run_artifacts/serving_decomp.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("-net", nargs="*", default=["unet", "segnet"])
    ap.add_argument("-floors", action="store_true",
                    help="also measure the transfer floors")
    ap.add_argument("-out", default="serving_decomp.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pytorch_camvid_tpu.data.synthetic import synthetic_arrays
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    from pytorch_camvid_tpu.serving import Predictor

    enable_compilation_cache()
    hw = (360, 480)
    batch = 24
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "run_artifacts", args.out)
    rows = []

    def emit(**kw):
        rows.append(kw)
        print(json.dumps(kw), flush=True)

    images, _ = synthetic_arrays(240, hw=hw, seed=3)

    # ---- stage floors (model-independent transfers) ----
    # NOTE: jax caches the host copy of an array after its first
    # np.asarray — D2H must be measured on a FRESH array per rep.
    if args.floors:
        reps = 5
        chunk = images[:batch]
        # H2D: uint8 (24,360,480,3) = 12.4 MB up
        dev = jnp.asarray(chunk)
        jax.block_until_ready(dev)
        t0 = time.perf_counter()
        for _ in range(reps):
            dev = jnp.asarray(chunk)
            jax.block_until_ready(dev)
        dt = (time.perf_counter() - t0) / reps
        emit(stage="h2d_uint8_batch", ms=round(1000 * dt, 2),
             mb=round(chunk.nbytes / 1e6, 2),
             mb_per_s=round(chunk.nbytes / dt / 1e6, 1),
             images_per_sec_bound=round(batch / dt, 1))

        # D2H: fresh uint8 mask-shaped and packed-mask-shaped arrays
        for label, shp in (("d2h_uint8_mask", (batch, hw[0], hw[1])),
                           ("d2h_uint8_mask_packed",
                            (batch, hw[0], hw[1] // 2))):
            g = jax.jit(lambda x, s: x + s)
            base = jnp.zeros(shp, jnp.uint8)
            jax.block_until_ready(base)
            ts = []
            for i in range(reps + 1):
                d = g(base, np.uint8(i))
                jax.block_until_ready(d)
                t0 = time.perf_counter()
                _ = np.asarray(d)
                ts.append(time.perf_counter() - t0)
            dt = float(np.mean(ts[1:]))
            emit(stage=label, ms=round(1000 * dt, 2),
                 mb=round(base.nbytes / 1e6, 2),
                 mb_per_s=round(base.nbytes / dt / 1e6, 1),
                 images_per_sec_bound=round(batch / dt, 1))

    # ---- per-model: compute floor + strategy grid ----
    for net in args.net:
        init_fn, apply_fn = get_model(net, 3, 12)
        variables = init_fn(jax.random.PRNGKey(0))

        # compute-only floor (device-resident bf16 input, one sync)
        dvars = jax.device_put(variables)
        xb = jnp.asarray(images[:batch], jnp.bfloat16)
        f = jax.jit(lambda v, x: jnp.argmax(
            apply_fn(v, x, train=False, compute_dtype=jnp.bfloat16)[0],
            -1).astype(jnp.uint8))
        r = f(dvars, xb)
        jax.block_until_ready(r)
        steps = 10
        t0 = time.perf_counter()
        for _ in range(steps):
            r = f(dvars, xb)
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        emit(stage="compute_only", net=net,
             images_per_sec=round(batch * steps / dt, 1),
             ms_per_batch=round(1000 * dt / steps, 2))

        p = Predictor(net, variables, batch_size=batch, image_hw=hw)
        p.predict(images[: 2 * batch])  # compile + warm

        for n_images in (120, 240):
            req = images[:n_images]
            for window, casync in ((3, True), (8, True), (8, False)):
                t0 = time.perf_counter()
                out = p.predict(req, max_inflight=window, copy_async=casync)
                dt = time.perf_counter() - t0
                assert out.shape == (n_images, hw[0], hw[1])
                emit(stage="predict_e2e", net=net, n_images=n_images,
                     window=window, copy_async=casync,
                     images_per_sec=round(n_images / dt, 1),
                     ms_total=round(1000 * dt, 1))

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    print(f"wrote {len(rows)} rows -> {out_path}")


if __name__ == "__main__":
    main()
