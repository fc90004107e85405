"""UNet non-conv op probe: pools, bilinear upsamples, skip concats.

PERF.md's backward decomposition left a ~57 ms residual (195 ms backward
minus 138 ms of conv VJP) attributed to "BN/ReLU elementwise and
skip-concat splits" — but UNet's pools go through `lax.reduce_window`
whose VJP lowers to `select_and_scatter`, and its 4 decoder upsamples are
einsum resizes whose VJPs are transposed matmuls. Neither was ever
measured per shape. This probe times, chained (same anti-CSE fori_loop
methodology as tools/perf_probe.py, net of the chain tax):

  pool_fwd_rw     lax.reduce_window max (current UNet production fwd)
  pool_fwd_mxu    Pallas phase pool fwd (values + int8 phase)
  pool_vjp_rw     VJP of reduce_window max (select_and_scatter path)
  pool_vjp_phase  the phase-unpool kernel (the Pallas pool's backward)
  ups_fwd         upsample2x_bilinear_align_corners (einsum resize)
  ups_vjp         its VJP (transposed einsums)
  cat_fwd         skip concat (channel axis)

at UNet's b24 shape inventory, against HBM-bandwidth bounds for each op's
unavoidable traffic. Reference analogue being replaced: nn.MaxPool2d /
nn.Upsample in /root/reference/models/unet.py.

Usage: python tools/unet_nonconv_probe.py [--batch 24] [--k 30]
Writes JSON lines; PERF.md summarizes a saved run.
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

HBM_GBPS = 819.0


def _timed(op, carry0, k, extras=()):
    """Chained timer: k data-dependent iterations in one jitted fori_loop.
    Outputs whose spatial dims differ from the carry are mixed back via a
    scalar sum (same construction as perf_probe's wgrad mode)."""
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
    import jax.numpy as jnp  # noqa: F401
    t_op = _timed(op, carry0, k, extras)
    t_tax = _timed(lambda c, *ex: c[..., : carry0.shape[-1]], carry0, k)
    return 1000.0 * max(t_op - t_tax, 1e-9), 1000.0 * t_tax


def probe(batch: int, k: int):
    import jax
    import jax.numpy as jnp
    from pytorch_camvid_tpu.ops.pooling import max_pool_2x2
    from pytorch_camvid_tpu.ops.resize import (
        upsample2x_bilinear_align_corners)
    from pytorch_camvid_tpu.ops.pallas_pool import (
        pool_phase_packed_train, max_unpool_2x2_phase_nat)

    key = jax.random.PRNGKey(0)
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    # ---- pools: encoder stages (input shapes) -------------------------
    pool_shapes = [(360, 480, 64), (180, 240, 128),
                   (90, 120, 256), (45, 60, 512)]
    for h, w, c in pool_shapes:
        x = jax.random.normal(key, (batch, h, w, c), jnp.bfloat16)
        g = jax.random.normal(key, (batch, h // 2, w // 2, c), jnp.bfloat16)
        kphase = (jax.random.randint(key, g.shape, 0, 4)).astype(jnp.int8)

        nbytes_x = x.size * 2
        nbytes_y = g.size * 2

        ms, tax = _net_ms(max_pool_2x2, x, k)
        bound = (nbytes_x + nbytes_y) / HBM_GBPS / 1e6
        emit({"op": "pool_fwd_rw", "shape": [batch, h, w, c],
              "ms": round(ms, 3), "ms_chain_tax": round(tax, 3),
              "bw_bound_ms": round(bound, 3)})

        ms, tax = _net_ms(lambda v: pool_phase_packed_train(v)[0], x, k)
        bound = (nbytes_x + nbytes_y + g.size) / HBM_GBPS / 1e6
        emit({"op": "pool_fwd_mxu", "shape": [batch, h, w, c],
              "ms": round(ms, 3), "ms_chain_tax": round(tax, 3),
              "bw_bound_ms": round(bound, 3)})

        # VJP of reduce_window max: carry is the half-res cotangent,
        # primal input passed as a jit argument (avoids giant literals)
        def pool_vjp(gc, xx):
            _, vjp = jax.vjp(max_pool_2x2, xx)
            (dx,) = vjp(gc)
            return dx
        ms, tax = _net_ms(pool_vjp, g, k, extras=(x,))
        bound = (nbytes_x + nbytes_y + nbytes_x) / HBM_GBPS / 1e6
        emit({"op": "pool_vjp_rw", "shape": [batch, h, w, c],
              "ms": round(ms, 3), "ms_chain_tax": round(tax, 3),
              "bw_bound_ms": round(bound, 3)})

        # the Pallas pool's backward: phase-unpool of the cotangent
        def phase_bwd(gc, kk):
            return max_unpool_2x2_phase_nat(gc, kk, (h, w))
        ms, tax = _net_ms(phase_bwd, g, k, extras=(kphase,))
        bound = (nbytes_y + g.size + nbytes_x) / HBM_GBPS / 1e6
        emit({"op": "pool_vjp_phase", "shape": [batch, h, w, c],
              "ms": round(ms, 3), "ms_chain_tax": round(tax, 3),
              "bw_bound_ms": round(bound, 3)})

    # ---- decoder upsamples (input shapes) ------------------------------
    ups_shapes = [(22, 30, 1024), (45, 60, 512),
                  (90, 120, 256), (180, 240, 128)]
    for h, w, c in ups_shapes:
        x = jax.random.normal(key, (batch, h, w, c), jnp.bfloat16)
        g = jax.random.normal(key, (batch, 2 * h, 2 * w, c), jnp.bfloat16)

        ms, tax = _net_ms(upsample2x_bilinear_align_corners, x, k)
        bound = (x.size * 2 + g.size * 2) / HBM_GBPS / 1e6
        emit({"op": "ups_fwd", "shape": [batch, h, w, c],
              "ms": round(ms, 3), "ms_chain_tax": round(tax, 3),
              "bw_bound_ms": round(bound, 3)})

        def ups_vjp(gc, xx):
            _, vjp = jax.vjp(upsample2x_bilinear_align_corners, xx)
            (dx,) = vjp(gc)
            return dx
        ms, tax = _net_ms(ups_vjp, g, k, extras=(x,))
        bound = (x.size * 2 + g.size * 2 + x.size * 2) / HBM_GBPS / 1e6
        emit({"op": "ups_vjp", "shape": [batch, h, w, c],
              "ms": round(ms, 3), "ms_chain_tax": round(tax, 3),
              "bw_bound_ms": round(bound, 3)})

    # ---- skip concats (decoder, skip + upsampled) ----------------------
    cat_shapes = [(45, 60, 512, 512), (90, 120, 256, 256),
                  (180, 240, 128, 128), (360, 480, 64, 64)]
    for h, w, c1, c2 in cat_shapes:
        a = jax.random.normal(key, (batch, h, w, c1), jnp.bfloat16)
        b = jax.random.normal(key, (batch, h, w, c2), jnp.bfloat16)

        def cat(v, bb):
            return jnp.concatenate([v, bb], axis=-1)
        ms, tax = _net_ms(cat, a, k, extras=(b,))
        nb = (a.size + b.size) * 2
        bound = 2 * nb / HBM_GBPS / 1e6
        emit({"op": "cat_fwd", "shape": [batch, h, w, c1 + c2],
              "ms": round(ms, 3), "ms_chain_tax": round(tax, 3),
              "bw_bound_ms": round(bound, 3)})

    # totals per category over one UNet forward/backward
    tot = {}
    for r in rows:
        tot[r["op"]] = tot.get(r["op"], 0.0) + r["ms"]
    print(json.dumps({"totals_ms": {kk: round(v, 2)
                                    for kk, v in tot.items()}}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--k", type=int, default=30)
    args = ap.parse_args()
    probe(args.batch, args.k)


if __name__ == "__main__":
    main()
