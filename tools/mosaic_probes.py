"""Mosaic capability probes for the conv-kernel redesign (run on the chip).

The round-1 conv kernel materializes THREE width-shifted copies of the
padded input in HBM (`shift_stack`, ops/pallas_conv.py) because in-VMEM
sublane slices at unaligned offsets were believed unsupported. These probes
establish, on the actual target + toolchain, which of the cheaper layouts
compile and run correctly:

  A. unaligned static sublane slice of a VMEM ref (x_ref[1:1+n, :])
  B. pl.ds dynamic sublane slice at an unaligned offset
  C. pltpu.roll along the sublane axis (bf16 and f32)
  D. three narrow DMAs from ONE padded HBM array at width offsets 0/1/2

Each probe prints OK/FAIL with the error class; results feed HARDWARE.md
and the kernel design in ops/pallas_conv.py.

Usage: python tools/mosaic_probes.py [--interpret]
"""

from __future__ import annotations

import argparse
import traceback

import numpy as np


def _run(name, fn):
    try:
        fn()
        print(f"{name}: OK")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL ({type(e).__name__}: {msg})")
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    interp = args.interpret

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, cols = 64, 256
    x32 = jnp.asarray(np.random.default_rng(0).normal(
        size=(rows, cols)).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)

    # A: static unaligned sublane slice
    def probe_a():
        def k(x_ref, o_ref):
            o_ref[:] = x_ref[1: 1 + 32, :]
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((32, cols), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp)(x32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x32)[1:33])

    # A16: same in bf16
    def probe_a16():
        def k(x_ref, o_ref):
            o_ref[:] = x_ref[1: 1 + 32, :]
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((32, cols), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp)(x16)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(x16, np.float32)[1:33])

    # B: dynamic unaligned sublane slice via pl.ds
    def probe_b():
        def k(s_ref, x_ref, o_ref):
            o_ref[:] = x_ref[pl.ds(s_ref[0], 32), :]
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((32, cols), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp)(jnp.asarray([3], jnp.int32), x32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x32)[3:35])

    # B-matmul: unaligned slice feeding the MXU (the conv use case)
    def probe_b_mm():
        w = jnp.asarray(np.random.default_rng(1).normal(
            size=(cols, 128)).astype(np.float32))

        def k(x_ref, w_ref, o_ref):
            o_ref[:] = jnp.dot(x_ref[1: 1 + 32, :], w_ref[:],
                               preferred_element_type=jnp.float32)
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp)(x32, w)
        want = np.asarray(x32)[1:33] @ np.asarray(w)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3,
                                   atol=5e-2)

    # C: pltpu.roll on sublane axis
    def probe_c(dtype):
        x = x32 if dtype == jnp.float32 else x16

        def k(x_ref, o_ref):
            o_ref[:] = pltpu.roll(x_ref[:], 1, 0)
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((rows, cols), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp)(x)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.roll(np.asarray(x, np.float32), 1, 0))

    # D: three DMAs from one HBM array at width offsets 0/1/2
    def probe_d():
        h, w, c = 16, 40, 128
        xp = jnp.asarray(np.random.default_rng(2).normal(
            size=(h, w + 8, c)).astype(np.float32))

        def k(x_hbm, o_ref, xs, sem):
            for d in range(3):
                cp = pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(d, w), :], xs.at[d], sem.at[d])
                cp.start()
            for d in range(3):
                pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(d, w), :], xs.at[d], sem.at[d]).wait()
            o_ref[:] = xs[0] + xs[1] + xs[2]

        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((h, w, c), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((3, h, w, c), jnp.float32),
                            pltpu.SemaphoreType.DMA((3,))],
            interpret=interp)(xp)
        xpn = np.asarray(xp)
        want = xpn[:, 0:w] + xpn[:, 1:w + 1] + xpn[:, 2:w + 2]
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)

    results = {
        "A_static_unaligned_sublane_slice_f32": _run(
            "A  static unaligned sublane slice (f32)", probe_a),
        "A_static_unaligned_sublane_slice_bf16": _run(
            "A16 static unaligned sublane slice (bf16)", probe_a16),
        "B_dynamic_unaligned_sublane_slice": _run(
            "B  dynamic (pl.ds) unaligned sublane slice", probe_b),
        "B_unaligned_slice_to_mxu": _run(
            "Bmm unaligned slice feeding MXU", probe_b_mm),
        "C_roll_sublane_f32": _run(
            "C  pltpu.roll sublane (f32)", lambda: probe_c(jnp.float32)),
        "C_roll_sublane_bf16": _run(
            "C16 pltpu.roll sublane (bf16)", lambda: probe_c(jnp.bfloat16)),
        "D_three_dmas_width_offsets": _run(
            "D  3 DMAs from one padded HBM array", probe_d),
    }
    print(results)


if __name__ == "__main__":
    main()
