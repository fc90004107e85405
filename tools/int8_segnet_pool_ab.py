"""Locate SegNet's whole-model int8 slowdown: pool-impl x dtype A/B.

SegNet int8 PTQ serving measured 0.89x of bf16 whole-model despite
1.4-2.0x per-conv int8 speedups, and the fused conv->conv handoff changed
nothing (tools/int8_fuse_ab.py) — XLA already fuses requant into direct
producers. Remaining suspect: the Pallas pool/unpool custom calls are
opaque to fusion, so every quantize after an unpool (and the bf16<->int8
layout transitions around the calls) materializes. This A/B runs the
whole eval forward for {bf16, int8} x {pallas_phase, argmax(XLA)} pools.

Usage: python tools/int8_segnet_pool_ab.py [-b 24] [-steps 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(r):
    return int(np.asarray(r[0, 0, 0]))


def _measure(f, variables, xb, steps):
    _sync(f(variables, xb))
    t0 = time.perf_counter()
    for _ in range(steps):
        r = f(variables, xb)
    _sync(r)
    return xb.shape[0] * steps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-b", type=int, default=24)
    ap.add_argument("-steps", type=int, default=20)
    args = ap.parse_args()

    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.ops.quant import calibrate, quantize_variables
    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(size=(args.b, 360, 480, 3)), jnp.bfloat16)

    init_fn, apply_fn = get_model("segnet", 3, 12)
    variables = jax.device_put(init_fn(jax.random.PRNGKey(0)))
    amax = calibrate(apply_fn, variables, [xb])
    qvars = jax.device_put(quantize_variables(variables, amax))

    for pool_impl in ("pallas_phase", "argmax"):
        os.environ["PCT_POOL_IMPL"] = pool_impl

        # fresh jit per impl: _pool_impl() is read at trace time
        def fwd(v, xx):
            return jnp.argmax(
                apply_fn(v, xx, train=False,
                         compute_dtype=jnp.bfloat16)[0],
                -1).astype(jnp.uint8)

        f = jax.jit(fwd)
        base = None
        for name, v in (("bf16", variables), ("int8", qvars)):
            ips = _measure(f, v, xb, args.steps)
            if name == "bf16":
                base = ips
            print(json.dumps({
                "pool_impl": pool_impl, "arm": name,
                "images_per_sec": round(ips, 1),
                "vs_bf16_same_pool": round(ips / base, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
