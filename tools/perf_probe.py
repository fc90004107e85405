"""Per-shape conv performance probe on the real chip (feeds PERF.md).

Round-1's perf story mixed two inconsistent numbers (VERDICT.md weak #1): a
71 TFLOP/s aggregate from the fused train step vs a "7.9 TFLOPS" per-block
probe. The per-block probe timed ONE dispatch per measurement, so through
the remote (axon tunnel) device it measured dispatch latency, not device
time. This probe times K data-dependent iterations inside ONE jitted
fori_loop, so per-call overhead is amortized and the number is true device
throughput for the op.

For every distinct conv3x3+BN+ReLU shape in UNet/SegNet at 360x480 it
reports: device ms/op, achieved TFLOP/s, and the roofline bound
min(peak_compute, arithmetic_intensity * HBM_bandwidth) for the shape —
so "XLA is/isn't at the bound" becomes a checkable claim per shape.

Usage:  python tools/perf_probe.py [--batch 24] [--k 30] [--pallas]
Writes JSON lines to stdout; PERF.md summarizes a saved run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# runnable as `python tools/perf_probe.py` from anywhere (PYTHONPATH is NOT
# an option: exporting it breaks the axon TPU plugin's backend discovery)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def unet_conv_shapes(hw=(360, 480)):
    """Distinct (h, w, cin, cout) conv3x3 shapes in UNet with multiplicity
    (how many times the shape occurs in one forward)."""
    h, w = hw
    d = [(h // (1 << i), w // (1 << i)) for i in range(5)]
    shapes = {}

    def add(hh, ww, ci, co, n=1):
        shapes[(hh, ww, ci, co)] = shapes.get((hh, ww, ci, co), 0) + n

    chans = [3, 64, 128, 256, 512, 1024]
    for i in range(5):  # encoder: (cin->cout), (cout->cout)
        add(*d[i], chans[i], chans[i + 1])
        add(*d[i], chans[i + 1], chans[i + 1])
    # decoder: upsample conv at 2x the lower dims (pre-pad), then two convs
    for i, lvl in zip(range(1, 5), (3, 2, 1, 0)):
        ch = chans[lvl + 2]  # 1024, 512, 256, 128
        add(d[lvl + 1][0] * 2, d[lvl + 1][1] * 2, ch, ch // 2)
        add(*d[lvl], ch, ch // 2)
        add(*d[lvl], ch // 2, ch // 2)
    add(h, w, 64, 12)  # output head
    return shapes


def roofline_tflops(batch, h, w, cin, cout, dtype_bytes=2,
                    peak_tflops=197.0, hbm_gbps=819.0):
    """Per-shape roofline: achievable TFLOP/s for conv3x3 given compute peak
    and HBM bandwidth (v5e defaults: 197 bf16 TFLOP/s, 819 GB/s)."""
    flops = 2.0 * 9.0 * batch * h * w * cin * cout
    bytes_ = dtype_bytes * batch * h * w * (cin + cout) \
        + dtype_bytes * 9 * cin * cout
    intensity = flops / bytes_
    return min(peak_tflops, intensity * hbm_gbps / 1000.0), flops


def probe_shape(batch, h, w, cin, cout, k=30, pallas=False,
                dtype=None):
    """Times the op net of the chain-harness tax: the same K-iteration
    chained loop is run with a trivial stand-in op (a channel slice) and
    its per-iteration time subtracted. Without this correction the carry
    mix (pad + add on the full activation) inflates both sides by ~2.4 ms
    at batch 24 x 90x120x512 and the numbers look 40% below roofline when
    the conv itself is near it."""
    import jax
    import jax.numpy as jnp
    dtype = dtype or jnp.bfloat16

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, h, w, cin), dtype)
    wgt = jax.random.normal(key, (3, 3, cin, cout), dtype) * 0.05
    a = jnp.ones((cout,), jnp.float32)
    b = jnp.zeros((cout,), jnp.float32)

    if pallas:
        from pytorch_camvid_tpu.ops.pallas_conv import conv3x3_bn_relu_pallas

        def op(v):
            return conv3x3_bn_relu_pallas(v, wgt, a, b)
    else:
        def op(v):
            y = jax.lax.conv_general_dilated(
                v, wgt, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return jnp.maximum(y * a + b, 0.0).astype(dtype)

    def timed(the_op):
        def chained(v):
            def body(i, c):
                y = the_op(c)
                # mix the output back into a same-shaped carry (data
                # dependency so XLA cannot elide or overlap iterations)
                # without changing magnitudes (1e-30 * y underflows in the
                # add but is not algebraically foldable)
                if y.shape[-1] >= cin:
                    mix = y[..., :cin]
                else:
                    mix = jnp.pad(
                        y, ((0, 0),) * 3 + ((0, cin - y.shape[-1]),))
                return c + (1e-30 * mix).astype(c.dtype)
            return jax.lax.fori_loop(0, k, body, v)

        f = jax.jit(chained)
        r = f(x)
        np.asarray(r[0, 0, 0, 0])  # sync
        t0 = time.perf_counter()
        r = f(x)
        np.asarray(r[0, 0, 0, 0])
        return (time.perf_counter() - t0) / k

    t_op = timed(op)
    t_base = timed(lambda c: c[..., :cout])  # chain tax stand-in
    net = max(t_op - t_base, 1e-9)

    bound, flops = roofline_tflops(batch, h, w, cin, cout)
    achieved = flops / net / 1e12
    return {
        "shape": [batch, h, w, cin, cout],
        "ms": round(1000.0 * net, 3),
        "ms_gross": round(1000.0 * t_op, 3),
        "ms_chain_tax": round(1000.0 * t_base, 3),
        "tflops": round(achieved, 1),
        "roofline_tflops": round(bound, 1),
        "pct_of_roofline": round(100.0 * achieved / bound, 1),
        "impl": "pallas" if pallas else "xla",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--shapes", type=str, default="unet",
                    choices=["unet", "dominant"])
    args = ap.parse_args()

    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    shapes = unet_conv_shapes()
    if args.shapes == "dominant":
        # the three highest total-FLOP shapes
        ranked = sorted(shapes.items(),
                        key=lambda kv: -kv[1] * kv[0][2] * kv[0][3]
                        * kv[0][0] * kv[0][1])
        shapes = dict(ranked[:3])

    for (h, w, cin, cout), mult in sorted(shapes.items()):
        row = probe_shape(args.batch, h, w, cin, cout, k=args.k,
                          pallas=args.pallas)
        row["multiplicity"] = mult
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
