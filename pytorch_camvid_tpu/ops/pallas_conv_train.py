"""Pallas TPU conv3x3 with a custom VJP — the training-path kernel family.

The serving kernel (ops/pallas_conv.py) fuses conv+affine+ReLU for
inference. Training additionally needs the two backward convolutions; this
module implements all three as Pallas kernels and wires them through
``jax.custom_vjp``:

- forward:   y  = conv3x3(x, W), pad 1 — 9 shifted (M, Cin) @ (Cin, Cout)
             MXU matmuls accumulated in VMEM (shared machinery with the
             serving kernel's shift-stack layout);
- d/d input: dx = conv3x3(g, flip(W)ᵀ) — the same forward kernel applied to
             the cotangent with the kernel spatially flipped and its
             channel axes swapped (computed by XLA, free);
- d/d weight: dW[dy,dx] = Σ_{n,hw} x_shift(dy,dx)[n,hw,ci] · g[n,hw,co] —
             one (Cin, M) @ (M, Cout) MXU matmul per tap, M = tile of
             N*H*W, accumulated across the grid into the 9 (Cin, Cout)
             output tiles.

BatchNorm in training needs global batch statistics of y, so BN/ReLU stay
outside this kernel (XLA fuses them); the conv is the MXU workhorse this
replaces.

Environment note: as with the serving kernel, every shape here compiles and
runs on the target per-op, but this environment's remote Mosaic helper
crashes when ~dozens of kernels land in one XLA program — so the training
opt-in (``conv_bn_relu_apply(..., train=True, use_pallas=True)`` or the
models' ``use_pallas`` flag) is validated per-op; the default training path
uses the XLA conv, which is at measured speed parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_camvid_tpu.ops.pallas_conv import (
    _pick_tile_h, _pick_tile_co, _round_up, shift_stack as _shift_stack)


def _fwd_kernel(x_hbm, w_ref, out_ref, xs, sem, *, tile_h, wq, cin):
    """Plain conv3x3 forward (the serving kernel minus the epilogue)."""
    n = pl.program_id(0)
    i = pl.program_id(1)
    co = pl.program_id(2)

    @pl.when(co == 0)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[:, n, pl.ds(i * tile_h, tile_h + 2)], xs, sem)
        cp.start()
        cp.wait()

    tile_co = w_ref.shape[-1]
    acc = jnp.zeros((tile_h * wq, tile_co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xs[dx, dy: dy + tile_h].reshape(tile_h * wq, cin)
            acc += jnp.dot(patch, w_ref[dy, dx],
                           preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(tile_h, wq, tile_co).astype(out_ref.dtype)


def _conv3x3_fwd(x: jax.Array, w: jax.Array) -> jax.Array:
    n, h, w_sp, cin = x.shape
    cout = w.shape[-1]
    dtype = x.dtype
    if cin < 128:  # sub-128 lanes crash the Mosaic compiler on this target
        pad_c = 128 - cin
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, pad_c),))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
        cin = 128

    wq = _round_up(w_sp, 8)
    xstk = _shift_stack(x, wq)
    tile_h = _pick_tile_h(h, 3 * wq, cin, itemsize=x.dtype.itemsize)
    tile_co = _pick_tile_co(cout, cin)
    grid = (n, h // tile_h, cout // tile_co)

    kernel = functools.partial(_fwd_kernel, tile_h=tile_h, wq=wq, cin=cin)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, cin, tile_co),
                         lambda n, i, co: (0, 0, 0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, wq, tile_co),
                               lambda n, i, co: (n, i, 0, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wq, cout), dtype),
        scratch_shapes=[
            pltpu.VMEM((3, tile_h + 2, wq, cin), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * h * wq * cin * cout,
            bytes_accessed=(xstk.size + w.size) * 2 + n * h * wq * cout * 2,
            transcendentals=0),
    )(xstk.astype(dtype), w.astype(dtype))
    return out[:, :, :w_sp, :]


def _dw_kernel(x_hbm, g_ref, dw_ref, xs, sem, *, tile_h, wq, cin):
    """dW accumulation: for each tap, (Cin, tile) @ (tile, TILE_CO), summed
    across the (n, i) grid into the (3, 3, Cin, TILE_CO) output block.

    Grid order (co, n, i) with co OUTERMOST: Pallas TPU only supports
    revisiting an accumulated output block on CONSECUTIVE grid steps, so
    the reduction dims (n, i) must be innermost. Each co block zero-inits
    at its first (n==0, i==0) visit, then accumulates; the x slab is
    re-DMA'd per step (it changes with n/i anyway)."""
    n = pl.program_id(1)
    i = pl.program_id(2)

    cp = pltpu.make_async_copy(
        x_hbm.at[:, n, pl.ds(i * tile_h, tile_h + 2)], xs, sem)
    cp.start()
    cp.wait()

    @pl.when(jnp.logical_and(n == 0, i == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    g = g_ref[0].reshape(tile_h * wq, g_ref.shape[-1])
    for dy in range(3):
        for dx in range(3):
            patch = xs[dx, dy: dy + tile_h].reshape(tile_h * wq, cin)
            dw_ref[dy, dx] += jnp.dot(
                patch.T, g, preferred_element_type=jnp.float32)


def _conv3x3_dw(x: jax.Array, g: jax.Array) -> jax.Array:
    """dW = correlation of x with the cotangent g (same spatial shape)."""
    n, h, w_sp, cin_orig = x.shape
    cout = g.shape[-1]
    cin = cin_orig
    if cin < 128:
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, 128 - cin),))
        cin = 128

    wq = _round_up(w_sp, 8)
    xstk = _shift_stack(x, wq)
    # zero-pad g's width-alignment columns so they contribute nothing
    gq = jnp.pad(g, ((0, 0), (0, 0), (0, wq - w_sp), (0, 0)))
    tile_h = _pick_tile_h(h, 3 * wq, cin, itemsize=x.dtype.itemsize)
    tile_co = _pick_tile_co(cout, cin)
    # co outermost: accumulated output blocks must be revisited on
    # consecutive grid steps (see _dw_kernel)
    grid = (cout // tile_co, n, h // tile_h)

    kernel = functools.partial(_dw_kernel, tile_h=tile_h, wq=wq, cin=cin)
    dw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, tile_h, wq, tile_co),
                         lambda co, n, i: (n, i, 0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, cin, tile_co),
                               lambda co, n, i: (0, 0, 0, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, cin, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, tile_h + 2, wq, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * h * wq * cin * cout,
            bytes_accessed=(xstk.size + gq.size) * 2 + 9 * cin * cout * 4,
            transcendentals=0),
    )(xstk, gq)
    return dw[:, :, :cin_orig, :]


@jax.custom_vjp
def conv3x3_pallas(x: jax.Array, w: jax.Array) -> jax.Array:
    """conv3x3 pad-1 NHWC/HWIO with Pallas forward and backward kernels."""
    return _conv3x3_fwd(x, w)


def _vjp_fwd(x, w):
    return _conv3x3_fwd(x, w), (x, w)


def _vjp_bwd(res, g):
    x, w = res
    # dx: conv of the cotangent with the spatially-flipped, channel-swapped
    # kernel (the transpose of a pad-1 3x3 conv is itself a pad-1 3x3 conv)
    w_flip = jnp.transpose(w[::-1, ::-1, :, :], (0, 1, 3, 2))
    dx = _conv3x3_fwd(g.astype(x.dtype), w_flip.astype(x.dtype))
    dw = _conv3x3_dw(x, g)
    return dx, dw.astype(w.dtype)


conv3x3_pallas.defvjp(_vjp_fwd, _vjp_bwd)
