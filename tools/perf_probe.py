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


def segnet_conv_shapes(hw=(360, 480)):
    """Distinct conv3x3 shapes in SegNet (VGG 2-2-3-3-3 encoder + mirrored
    decoder at the unpooled resolutions) with multiplicity — the per-shape
    basis for explaining SegNet's MFU vs UNet's (VERDICT r2 weak #4)."""
    from pytorch_camvid_tpu.models.segnet import _segnet_spec
    spec = dict(_segnet_spec(3, 12))
    h, w = hw
    dims = [(h, w)]
    for _ in range(4):
        dims.append((dims[-1][0] // 2, dims[-1][1] // 2))
    shapes = {}

    def add(hh, ww, ci, co, n=1):
        shapes[(hh, ww, ci, co)] = shapes.get((hh, ww, ci, co), 0) + n

    for i in range(5):
        for cin, cout in spec[f"encoder{i + 1}"]:
            add(*dims[i], cin, cout)
    for i in range(5, 0, -1):  # decoder i at encoder i's input resolution
        for cin, cout in spec[f"decoder{i}"]:
            add(*dims[i - 1], cin, cout)
    return shapes


def probe_pool_ops(batch, hw=(360, 480), k=30, impl="argmax"):
    """Times SegNet's non-conv hot structure per stage: the
    maxpool-with-indices + index-unpool PAIR (what a SegNet
    encoder/decoder level actually pays beyond convs) — the candidate
    explanation for SegNet's MFU gap that the conv table can't show.

    impl="argmax": flat-int32-index pair (torch-convention indices);
    impl="phase": int8 2-bit-phase pair (ops/pooling.py phase forms).

    Chained k times through a fori_loop with a data-dependent carry (same
    anti-CSE construction as probe_shape) and compared against the HBM
    bandwidth bound for the pair's unavoidable traffic."""
    import jax
    import jax.numpy as jnp
    from pytorch_camvid_tpu.ops.pooling import (
        max_pool_2x2_with_argmax, max_unpool_2x2,
        max_pool_2x2_with_phase, max_unpool_2x2_from_phase,
        max_pool_2x2_argmax_phase)

    if impl == "hybrid":
        pool_fn, unpool_fn, idx_bytes = (
            max_pool_2x2_argmax_phase, max_unpool_2x2_from_phase, 1)
    elif impl == "phase":
        pool_fn, unpool_fn, idx_bytes = (
            max_pool_2x2_with_phase, max_unpool_2x2_from_phase, 1)
    elif impl == "pallas":
        from pytorch_camvid_tpu.ops.pallas_pool import (
            max_pool_2x2_argmax_pallas, max_unpool_2x2_pallas)
        pool_fn, unpool_fn, idx_bytes = (
            max_pool_2x2_argmax_pallas, max_unpool_2x2_pallas, 4)
    elif impl == "packed":
        # the round-3 TPU production pair (models/segnet.py _pool_impl)
        from pytorch_camvid_tpu.ops.pallas_pool import (
            max_pool_2x2_phase_packed, max_unpool_2x2_phase_nat)
        pool_fn, unpool_fn, idx_bytes = (
            max_pool_2x2_phase_packed, max_unpool_2x2_phase_nat, 1)
    else:
        pool_fn, unpool_fn, idx_bytes = (
            max_pool_2x2_with_argmax, max_unpool_2x2, 4)

    h, w = hw
    dims = [(h, w)]
    for _ in range(4):
        dims.append((dims[-1][0] // 2, dims[-1][1] // 2))
    chans = [64, 128, 256, 512, 512]
    rows = []
    for i in range(5):
        hh, ww = dims[i]
        c = chans[i]
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, hh, ww, c),
                              jnp.bfloat16)

        def chained(v):
            def body(_, carry):
                y, idx = pool_fn(carry)
                up = unpool_fn(y, idx, (hh, ww))
                return carry + (1e-30 * up).astype(carry.dtype)
            return jax.lax.fori_loop(0, k, body, v)

        f = jax.jit(chained)
        r = f(x)
        np.asarray(r[0, 0, 0, 0])
        t0 = time.perf_counter()
        r = f(x)
        np.asarray(r[0, 0, 0, 0])
        t_pair = (time.perf_counter() - t0) / k

        # unavoidable traffic for the pair: read x, write y (bf16) + idx
        # (int32 or int8 phase), read both back, write the full-res output
        y_elems = batch * (hh // 2) * (ww // 2) * c
        traffic = x.size * 2 * 2 + y_elems * (2 + idx_bytes) * 2
        bound_ms = traffic / 819e9 * 1e3
        rows.append({
            "stage": i + 1, "impl": impl, "shape": [batch, hh, ww, c],
            "pool_unpool_ms": round(1000 * t_pair, 3),
            "bw_bound_ms": round(bound_ms, 3),
            "pct_of_bw_bound": round(100 * bound_ms / max(1e-9,
                                                          1000 * t_pair), 1),
        })
    return rows


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
                dtype=None, mode: str = "fwd", pair=False):
    """Times the op net of the chain-harness tax: the same K-iteration
    chained loop is run with a trivial stand-in op (a channel slice) and
    its per-iteration time subtracted. Without this correction the carry
    mix (pad + add on the full activation) inflates both sides by ~2.4 ms
    at batch 24 x 90x120x512 and the numbers look 40% below roofline when
    the conv itself is near it.

    mode: 'fwd' (conv+BN+ReLU), 'dgrad' (cotangent -> dx VJP) or 'wgrad'
    (cotangent -> dW VJP) — the per-shape backward breakdown VERDICT r2
    weak #1 asked for. The chained carry is the cotangent for the VJP
    modes (same shape family, same anti-CSE mix)."""
    import jax
    import jax.numpy as jnp
    dtype = dtype or jnp.bfloat16

    key = jax.random.PRNGKey(0)
    op_extras = ()  # extra jit ARGUMENTS for the op (see wgrad)
    x = jax.random.normal(key, (batch, h, w, cin), dtype)
    wgt = jax.random.normal(key, (3, 3, cin, cout), dtype) * 0.05
    a = jnp.ones((cout,), jnp.float32)
    b = jnp.zeros((cout,), jnp.float32)

    def conv(v, w_):
        return jax.lax.conv_general_dilated(
            v, w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    if mode == "fwd":
        carry0 = x
        carry_ch = cin
        if pair:
            # H-pair lane-packed kernel (ops/pallas_conv_pair.py): the
            # C<=64 occupancy experiment — 2x executed FLOPs at full
            # 128-lane K and N. pair="control" runs the aligned-taps
            # control arm (wrong math) isolating the dx-shift cost.
            from pytorch_camvid_tpu.ops.pallas_conv_pair import (
                conv3x3_pair_bn_relu)
            # "control" = aligned stores; "noshift" = no stores at all
            ctl = pair if isinstance(pair, str) else False

            def op(v):
                return conv3x3_pair_bn_relu(v, wgt, a, b,
                                            control_aligned=ctl)
        elif pallas:
            from pytorch_camvid_tpu.ops.pallas_conv import (
                conv3x3_bn_relu_pallas)

            def op(v):
                return conv3x3_bn_relu_pallas(v, wgt, a, b)
        else:
            def op(v):
                y = conv(v, wgt)
                return jnp.maximum(y * a + b, 0.0).astype(dtype)
    elif mode == "dgrad":
        # cotangent (N,H,W,Cout) -> dx (N,H,W,Cin): conv with the
        # spatially-flipped, in/out-transposed kernel (what XLA's autodiff
        # emits for an NHWC stride-1 SAME conv)
        carry0 = jax.random.normal(key, (batch, h, w, cout), dtype)
        carry_ch = cout
        wgt_t = jnp.flip(wgt, (0, 1)).transpose(0, 1, 3, 2)

        def op(g):
            return conv(g, wgt_t).astype(dtype)
    elif mode == "blockvjp":
        # FULL production-block VJP (conv + train-mode BN + ReLU wrt x
        # AND w): blockvjp - (dgrad + wgrad) isolates the BN/ReLU
        # backward elementwise cost per shape — the last unmeasured
        # term of UNet's 195 ms backward (PERF.md round 3).
        from pytorch_camvid_tpu.ops.conv import (
            conv_bn_relu_init, conv_bn_relu_apply)
        params, state = conv_bn_relu_init(key, cin, cout)
        params = dict(params, w=wgt)
        carry0 = jax.random.normal(key, (batch, h, w, cout), dtype)
        carry_ch = cout

        def op(g, xx):
            def blk(args):
                x_, w_ = args
                y, _ = conv_bn_relu_apply(
                    dict(params, w=w_), state, x_, train=True,
                    compute_dtype=dtype)
                return y
            y, vjp = jax.vjp(blk, (xx, wgt))
            (dx, dw) = vjp(g.astype(y.dtype))[0]
            return dx.astype(dtype) + (1e-30 * jnp.sum(dw)).astype(dtype)
        op_extras = (x,)
    elif mode == "wgrad":
        carry0 = jax.random.normal(key, (batch, h, w, cout), dtype)
        carry_ch = cout

        # mirror the production conv (ops/conv.py: no preferred_element_type,
        # output dtype follows the bf16 inputs) so the VJP emits the same
        # wgrad conv the training step does; cotangent is the bf16 carry.
        # x must be a jit ARGUMENT, not a closure capture: captured it is
        # baked into the HLO as a literal and the 530 MB shapes exceed the
        # tunnel's remote_compile request limit (HTTP 413).
        def op(g, xx):
            def prod_conv(w_):
                return jax.lax.conv_general_dilated(
                    xx, w_, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            _, vjp = jax.vjp(prod_conv, wgt)
            (dw,) = vjp(g)
            return dw
        op_extras = (x,)
    else:
        raise ValueError(mode)

    def timed(the_op, iters, extras=()):
        def chained(v, *ex):
            def body(i, c):
                y = the_op(c, *ex)
                # mix the output back into a same-shaped carry (data
                # dependency so XLA cannot elide or overlap iterations)
                # without changing magnitudes (1e-30 * y underflows in the
                # add but is not algebraically foldable)
                if y.shape[:-1] != c.shape[:-1]:  # wgrad: dW -> scalar mix
                    return c + (1e-30 * jnp.sum(y)).astype(c.dtype)
                if y.shape[-1] >= carry_ch:
                    mix = y[..., :carry_ch]
                else:
                    mix = jnp.pad(
                        y, ((0, 0),) * 3 + ((0, carry_ch - y.shape[-1]),))
                return c + (1e-30 * mix).astype(c.dtype)
            return jax.lax.fori_loop(0, iters, body, v)

        f = jax.jit(chained)
        r = f(carry0, *extras)
        np.asarray(r[0, 0, 0, 0])  # sync
        t0 = time.perf_counter()
        r = f(carry0, *extras)
        np.asarray(r[0, 0, 0, 0])
        return (time.perf_counter() - t0) / iters

    bound, flops = roofline_tflops(batch, h, w, cin, cout)

    # the chain-tax subtraction is noise-limited when the op is a small
    # fraction of the chain; a row claiming more TFLOP/s than physics is a
    # measurement failure, not a result (VERDICT r2 weak #6) — re-measure
    # with 3x the iterations until it drops below the bound or retries run
    # out, and mark any survivor as suspect instead of shipping it.
    kk = k
    for attempt in range(3):
        t_op = timed(op, kk, op_extras)
        t_base = timed(lambda c, *ex: c[..., :cout], kk)  # chain tax stand-in
        net = max(t_op - t_base, 1e-9)
        achieved = flops / net / 1e12
        if achieved <= bound:
            break
        kk *= 3
    row = {
        "shape": [batch, h, w, cin, cout],
        "ms": round(1000.0 * net, 3),
        "ms_gross": round(1000.0 * t_op, 3),
        "ms_chain_tax": round(1000.0 * t_base, 3),
        "tflops": round(achieved, 1),
        "roofline_tflops": round(bound, 1),
        "pct_of_roofline": round(100.0 * achieved / bound, 1),
        "impl": "pair" if pair else ("pallas" if pallas else "xla"),
        "mode": mode,
        "k": kk,
    }
    if achieved > bound:
        row["suspect"] = ("exceeds roofline after retries: chain-tax "
                          "subtraction below noise floor for this shape")
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--pair", nargs="?", const=True, default=False,
                    help="H-pair lane-packed kernel "
                         "(ops/pallas_conv_pair.py); '--pair control' "
                         "runs the aligned-taps control arm")
    ap.add_argument("--shapes", type=str, default="unet",
                    choices=["unet", "segnet", "dominant", "pool",
                             "shallow64"])
    ap.add_argument("--mode", type=str, default="fwd",
                    choices=["fwd", "dgrad", "wgrad", "blockvjp"])
    ap.add_argument("--pool-impl", type=str, default="argmax",
                    choices=["argmax", "phase", "pallas", "hybrid",
                             "packed"])
    args = ap.parse_args()

    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    if args.shapes == "pool":
        for row in probe_pool_ops(args.batch, k=args.k,
                                  impl=args.pool_impl):
            print(json.dumps(row), flush=True)
        return

    if args.shapes == "shallow64":
        # the pair-kernel target family (Cout>=64: the output store is
        # two lane-half slices, so Cout=12 heads are out of scope)
        shapes = {(360, 480, 64, 64): 2, (360, 480, 128, 64): 2}
    else:
        shapes = (segnet_conv_shapes() if args.shapes == "segnet"
                  else unet_conv_shapes())
    if args.shapes == "dominant":
        # the three highest total-FLOP shapes
        ranked = sorted(shapes.items(),
                        key=lambda kv: -kv[1] * kv[0][2] * kv[0][3]
                        * kv[0][0] * kv[0][1])
        shapes = dict(ranked[:3])

    for (h, w, cin, cout), mult in sorted(shapes.items()):
        row = probe_shape(args.batch, h, w, cin, cout, k=args.k,
                          pallas=args.pallas, pair=args.pair,
                          mode=args.mode)
        row["multiplicity"] = mult
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
