"""On-chip A/B of conv3x3 formulations for the MXU-underfilled shapes.

PERF.md: the four full-resolution shallow shapes run at 5-42% of peak and
are ~70% of forward wall-time; VERDICT r2 next-step #3 asks for measured
verdicts on the reformulations round 2 never tried. This tool times, with
the same anti-CSE chained-fori_loop methodology as tools/perf_probe.py:

  direct   — lax.conv_general_dilated (the production path)
  s2d      — ops/conv_alt.s2d_conv3x3 (space-to-depth: K x24, N x2,
             at 12/9 the MACs)
  im2col   — ops/conv_alt.im2col_conv3x3 (patches + one matmul)

Usage: python tools/shallow_conv.py [--batch 24] [--k 30]
Writes JSON lines; the PERF.md shallow table cites a saved run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# the underperformers from run_artifacts/probe_xla_unet_b24.jsonl
SHALLOW_SHAPES = [
    (360, 480, 3, 64),     # stem: 2.6 TF/s measured (Cin=3)
    (360, 480, 64, 64),    # 44.1 TF/s
    (360, 480, 128, 64),   # 83.5 TF/s
    (360, 480, 64, 12),    # head: 3.9 TF/s
    (180, 240, 64, 128),   # 67.3 TF/s
]


def timed_chain(op, x, k):
    import jax
    import jax.numpy as jnp
    cin = x.shape[-1]

    def chained(v):
        def body(i, c):
            y = op(c)
            if y.shape[-1] >= cin:
                mix = y[..., :cin]
            else:
                mix = jnp.pad(y, ((0, 0),) * 3 + ((0, cin - y.shape[-1]),))
            return c + (1e-30 * mix).astype(c.dtype)
        return jax.lax.fori_loop(0, k, body, v)

    f = jax.jit(chained)
    r = f(x)
    np.asarray(r[0, 0, 0, 0])
    t0 = time.perf_counter()
    r = f(x)
    np.asarray(r[0, 0, 0, 0])
    return (time.perf_counter() - t0) / k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--k", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pytorch_camvid_tpu.ops.conv_alt import (
        im2col_conv3x3, s2d_conv3x3, wpair_conv3x3)
    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    for h, w, cin, cout in SHALLOW_SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (args.batch, h, w, cin), jnp.bfloat16)
        wgt = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.05

        def direct(v):
            return jax.lax.conv_general_dilated(
                v, wgt, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def s2d(v):
            return s2d_conv3x3(v, wgt).astype(jnp.bfloat16)

        def im2col(v):
            return im2col_conv3x3(v, wgt).astype(jnp.bfloat16)

        def wpair(v):
            return wpair_conv3x3(v, wgt).astype(jnp.bfloat16)

        # chain-tax baseline (subtracted from all three identically)
        tax = timed_chain(lambda c: c[..., : min(cout, cin)], x, args.k)
        row = {"shape": [args.batch, h, w, cin, cout],
               "ms_chain_tax": round(1000 * tax, 3)}
        flops = 2.0 * 9.0 * args.batch * h * w * cin * cout
        for name, op in [("direct", direct), ("s2d", s2d),
                         ("im2col", im2col), ("wpair", wpair)]:
            try:
                t = timed_chain(op, x, args.k)
            except Exception as e:  # e.g. odd dims for s2d
                row[name] = {"error": str(e)[:120]}
                continue
            net = max(t - tax, 1e-9)
            row[name] = {"ms": round(1000 * net, 3),
                         "tflops": round(flops / net / 1e12, 1)}
        alts = [n for n in ("s2d", "im2col", "wpair")
                if isinstance(row.get(n), dict) and "ms" in row[n]]
        if alts and "ms" in row.get("direct", {}):
            best = min(alts, key=lambda n: row[n]["ms"])
            row["speedup_best_alt"] = round(
                row["direct"]["ms"] / row[best]["ms"], 2)
            row["best_alt"] = best
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
