"""Whole-model int8 UNet decomposition: per-stage bf16 vs int8, in context.

VERDICT r3 weak #5: per-conv int8 probes measured 1.4-2.0x on every hot
UNet shape, yet the whole-model int8 forward lands at 1.19x
(mfu_compute_only_int8 0.296). This tool locates the leak by timing every
STAGE of the real serving forward — including its glue ops (pool entry,
bilinear upsample, pad+concat, stage-entry requantize, the <64-channel
head) — in both the bf16 production form and the int8 PTQ form
(ops/quant.py, fused intra-stage handoff exactly as serving runs it).

Methodology: chained fori_loop probes net of chain tax (same anti-CSE
construction as tools/perf_probe.py / tools/unet_nonconv_probe.py) —
never a single dispatch through the tunnel. Quantized THROUGHPUT does not
depend on weight values, so stages run on random weights with a synthetic
calibration amax.

Usage: python tools/int8_model_decomp.py [--batch 24] [--k 20]
Writes run_artifacts/int8_model_decomp.jsonl; PERF.md summarizes.
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


def _timed(op, carry0, k, extras=()):
    """Chained timer (see tools/unet_nonconv_probe.py::_timed)."""
    import jax
    import jax.numpy as jnp

    cc = carry0.shape[-1]

    def chained(v, *ex):
        def body(i, c):
            y = op(c, *ex)
            if y.shape[:-1] != c.shape[:-1]:
                return c + (1e-30 * jnp.sum(y.astype(jnp.float32))
                            ).astype(c.dtype)
            if y.shape[-1] >= cc:
                mix = y[..., :cc]
            else:
                mix = jnp.pad(y, ((0, 0),) * 3 + ((0, cc - y.shape[-1]),))
            return c + (1e-30 * mix).astype(c.dtype)
        return jax.lax.fori_loop(0, k, body, v)

    f = jax.jit(chained)
    r = f(carry0, *extras)
    np.asarray(r[0, 0, 0, 0])
    t0 = time.perf_counter()
    r = f(carry0, *extras)
    np.asarray(r[0, 0, 0, 0])
    return (time.perf_counter() - t0) / k


def _net_ms(op, carry0, k, extras=()):
    t_op = _timed(op, carry0, k, extras)
    t_tax = _timed(lambda c, *ex: c[..., : carry0.shape[-1]], carry0, k)
    return 1000.0 * max(t_op - t_tax, 1e-9), 1000.0 * t_tax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--stages", nargs="*", default=None,
                    help="subset of stage names to probe")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.models.unet import _pad_to_match
    from pytorch_camvid_tpu.ops.conv import conv_bn_relu_apply
    from pytorch_camvid_tpu.ops.pooling import max_pool_2x2
    from pytorch_camvid_tpu.ops.resize import (
        upsample2x_bilinear_align_corners)
    from pytorch_camvid_tpu.ops.quant import (_map_blocks,
                                              quantize_variables)
    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    b = args.batch
    key = jax.random.PRNGKey(0)
    init_fn, _ = get_model("unet", 3, 12)
    variables = init_fn(key)
    # synthetic calibration: throughput is value-independent
    amax = _map_blocks(variables["state"],
                       lambda s: jnp.asarray(4.0, jnp.float32))
    qvars = quantize_variables(variables, amax)

    def stage_apply(params_stage, states_stage, x):
        for p, s in zip(params_stage, states_stage):
            x, _ = conv_bn_relu_apply(p, s, x, train=False,
                                      compute_dtype=jnp.bfloat16)
        return x

    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    dims = [(360, 480), (180, 240), (90, 120), (45, 60), (22, 30)]
    enc_cin = [3, 64, 128, 256, 512]

    def probe_pair(name, mk_fn, carry_shape, dtype=jnp.bfloat16,
                   extras_builder=None):
        """Time bf16 vs int8 variants of one stage body. The chain tax is
        measured ONCE per stage and shared by both variants — re-measuring
        it per variant let tunnel jitter swamp small stages."""
        x = jax.random.normal(key, (b,) + carry_shape, dtype)
        extras = extras_builder() if extras_builder else ()
        tax = _timed(lambda c, *ex: c[..., : x.shape[-1]], x, args.k)
        out = {}
        for variant, vtree in (("bf16", variables), ("int8", qvars)):
            fn = mk_fn(vtree)
            t_op = _timed(fn, x, args.k, extras=extras)
            ms = 1000.0 * max(t_op - tax, 1e-9)
            out[variant] = ms
            emit({"stage": name, "variant": variant, "ms": round(ms, 3),
                  "ms_raw": round(1000.0 * t_op, 3),
                  "ms_chain_tax": round(1000.0 * tax, 3)})
        emit({"stage": name, "variant": "speedup",
              "x": round(out["bf16"] / out["int8"], 3)})

    want = args.stages

    # ---- encoder stages: pool entry (i>0) + conv pair ----
    for i in range(5):
        name = f"down{i + 1}"
        if want and name not in want:
            continue
        h, w = dims[i]
        cin = enc_cin[i]
        if i == 0:
            def mk(vtree, name=name):
                return lambda x: stage_apply(vtree["params"][name],
                                             vtree["state"][name], x)
            shape = (h, w, cin)
        else:
            hp, wp = dims[i - 1]

            def mk(vtree, name=name):
                return lambda x: stage_apply(vtree["params"][name],
                                             vtree["state"][name],
                                             max_pool_2x2(x))
            shape = (hp, wp, cin)
        probe_pair(name, mk, shape)

    # ---- decoder stages: upsample + conv + pad/concat skip + conv pair ----
    skips = [(3, 512), (2, 256), (1, 128), (0, 64)]  # (dim idx, channels)
    for i, (d, skc) in zip(range(1, 5), skips):
        name = f"dec{i}"
        if want and name not in want:
            continue
        hin, win = dims[d + 1]
        cin = 1024 // (2 ** (i - 1))
        hs, ws = dims[d]
        # the skip tensor rides as a jit ARGUMENT: closing over it bakes a
        # up-to-265 MB constant into the program and the remote compile
        # service rejects the oversized request body (HTTP 413)
        skip = jax.random.normal(key, (b, hs, ws, skc), jnp.bfloat16)

        def mk(vtree, i=i):
            def fn(x, skip):
                y = upsample2x_bilinear_align_corners(x)
                y = stage_apply(vtree["params"][f"upsample{i}"],
                                vtree["state"][f"upsample{i}"], y)
                y = _pad_to_match(y, skip)
                y = jnp.concatenate([y, skip], axis=-1)
                return stage_apply(vtree["params"][f"up{i}"],
                                   vtree["state"][f"up{i}"], y)
            return fn
        probe_pair(name, mk, (hin, win, cin),
                   extras_builder=lambda skip=skip: (skip,))

    # ---- head: 64 -> 12 conv (lane-padded on both paths) ----
    if not want or "head" in want:
        def mk_head(vtree):
            return lambda x: stage_apply(vtree["params"]["output"],
                                         vtree["state"]["output"], x)
        probe_pair("head", mk_head, (360, 480, 64))

    # ---- whole model (ties the stage sum to bench.py's ratio) ----
    if not want or "whole" in want:
        _, apply_fn = get_model("unet", 3, 12)

        def mk_whole(vtree):
            return lambda x: apply_fn(vtree, x, train=False,
                                      compute_dtype=jnp.bfloat16)[0]
        probe_pair("whole_model", mk_whole, (360, 480, 3))

    # per-variant totals over the stage rows
    tot = {}
    for r in rows:
        if r["stage"] != "whole_model" and "ms" in r:
            tot[r["variant"]] = tot.get(r["variant"], 0.0) + r["ms"]
    emit({"stage": "stage_sum", "totals_ms":
          {kk: round(v, 2) for kk, v in tot.items()}})

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "run_artifacts",
        "int8_model_decomp.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    print(f"wrote {len(rows)} rows -> {out_path}")


if __name__ == "__main__":
    main()
