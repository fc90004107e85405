"""A/B the int8 fused conv->conv handoff against the unfused PTQ path.

Whole-model compute-only serving throughput (device-resident input, one
uint8 argmax map out), three arms per net: bf16, int8 unfused (each block
re-quantizes its own input from the bf16 activation), int8 fused
(producers emit the successor's int8 operand directly on direct edges —
ops/quant.py::fuse_block_handoff). Writes one JSON line per arm.

Usage: python tools/int8_fuse_ab.py [-b 24] [-steps 10] [-nets unet,segnet]
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
    # block_until_ready is unreliable through the axon device tunnel
    # (see bench.py); a tiny scalar fetch is a real host sync
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
    ap.add_argument("-steps", type=int, default=10)
    ap.add_argument("-nets", default="unet,segnet")
    ap.add_argument("-hw", default="360,480")
    args = ap.parse_args()
    hw = tuple(int(v) for v in args.hw.split(","))

    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.ops.quant import calibrate, quantize_variables
    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(args.b, hw[0], hw[1], 3)).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)

    for net in args.nets.split(","):
        init_fn, apply_fn = get_model(net, 3, 12)
        variables = jax.device_put(init_fn(jax.random.PRNGKey(0)))
        f = jax.jit(lambda v, xx: jnp.argmax(
            apply_fn(v, xx, train=False, compute_dtype=jnp.bfloat16)[0],
            -1).astype(jnp.uint8))
        amax = calibrate(apply_fn, variables, [xb])
        arms = {
            "bf16": variables,
            "int8_unfused": jax.device_put(
                quantize_variables(variables, amax, fuse_handoff=False)),
            "int8_fused": jax.device_put(
                quantize_variables(variables, amax, fuse_handoff=True)),
        }
        base = None
        for name, v in arms.items():
            ips = _measure(f, v, xb, args.steps)
            if name == "bf16":
                base = ips
            print(json.dumps({
                "net": net, "arm": name, "batch": args.b,
                "images_per_sec": round(ips, 1),
                "vs_bf16": round(ips / base, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
