"""Pallas TPU conv3x3 with a custom VJP — the training-path kernel family.

The serving kernel (ops/pallas_conv.py) fuses conv+affine+ReLU for
inference. Training additionally needs the two backward convolutions; this
module wires all three through ``jax.custom_vjp``:

- forward:   y  = conv3x3(x, W), pad 1 — the serving kernel with a unit
             affine and the ReLU clamp compiled out (relu=False);
- d/d input: dx = conv3x3(g, flip(W)ᵀ) — the same forward kernel applied to
             the cotangent with the kernel spatially flipped and its
             channel axes swapped (computed by XLA, free);
- d/d weight: dW[dy,dx] = Σ_{n,hw} x_shift(dy,dx)[n,hw,ci] · g[n,hw,co] —
             one (Cin, M) @ (M, Cout) MXU matmul per tap, M = tile of
             N*H*W, accumulated across the grid into the 9 (Cin, Cout)
             output tiles.

Round 2: both kernels use the single-slab layout (one zero-padded flat
view of the input in HBM; the nine taps are STATIC unaligned sublane
slices — see ops/pallas_conv.py) instead of round 1's ``shift_stack``,
which materialized three width-shifted copies in HBM; the dW slab DMA is
double-buffered across the reduction grid instead of a blocking re-DMA
per step.

BatchNorm in training needs global batch statistics of y, so BN/ReLU stay
outside this kernel (XLA fuses them); the conv is the MXU workhorse this
replaces.

Environment note: as with the serving kernel, every shape here compiles and
runs on the target per-op, but this environment's remote Mosaic helper
crashes when ~dozens of kernels land in one XLA program — so the training
opt-in (``conv_bn_relu_apply(..., train=True, use_pallas=True)`` or the
models' ``use_pallas`` flag) is validated per-op; the default training path
uses the XLA conv, which the per-shape probes show is at the compute
roofline on the deep shapes (PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_camvid_tpu.ops.pallas_conv import (
    _conv3x3_impl, _pick_tile_co, _pick_tiles, _round_up)


def pallas_train_supported(x_shape, cout: int, itemsize: int = 2) -> bool:
    """True when the whole custom-VJP kernel family (forward conv, dx
    conv, dW reduction) has a feasible VMEM tiling at this conv shape.

    conv_bn_relu_apply uses this to fall back to the XLA conv PER SHAPE,
    so ``use_pallas=True`` training runs whole-model as a mixed path
    instead of raising at the one layer whose dW slab cannot tile (e.g.
    the H=22, Cin=1024 bottleneck at reduced resolutions —
    tools/pallas_full_train_step.py records the attempt)."""
    n, h, w_sp, cin = x_shape
    wq = _round_up(w_sp + 2, 8)
    try:
        _pick_tiles(h, wq, max(cin, 128), cout, itemsize)     # forward
        _pick_tiles(h, wq, max(cout, 128), cin, itemsize)     # dx conv
        _pick_tiles_dw(h, wq, max(cin, 128), cout, itemsize)  # dW
    except ValueError:
        return False
    return True


def _conv3x3_fwd(x: jax.Array, w: jax.Array) -> jax.Array:
    """Plain conv3x3 pad-1: the serving kernel with a=1, b=0, relu off."""
    cout = w.shape[-1]
    ones = jnp.ones((cout,), jnp.float32)
    zeros = jnp.zeros((cout,), jnp.float32)
    return _conv3x3_impl(x, w, ones, zeros, relu=False)


def _pick_tiles_dw(h: int, wq: int, cin: int, cout: int, itemsize: int,
                   budget: int = 12 << 20):
    """(tile_h, tile_co) for the dW kernel with full VMEM accounting:
    2 double-buffered slabs, pipeline-buffered g blocks, the f32
    (3,3,Cin,TCO) accumulator block, and tap-slice relayout temporaries."""
    tile_co = _pick_tile_co(cout, cin, bytes_budget=(5 << 20) // 4)

    def usage(th):
        slab = _round_up((th + 2) * wq + 2, 8) * cin * itemsize
        gbytes = th * wq * tile_co * itemsize
        dw = 9 * cin * tile_co * 4
        slice_tmp = 2 * th * wq * cin * itemsize
        return 2 * slab + 2 * gbytes + dw + slice_tmp

    best = 0
    for th in range(1, h + 1):
        if h % th == 0 and usage(th) <= budget:
            best = th
    if best == 0:
        raise ValueError(
            f"conv3x3 dW Pallas kernel: no tile of H={h} fits VMEM "
            f"(W'={wq}, Cin={cin}, Cout tile={tile_co}) — use the XLA "
            f"conv (use_pallas=False)")
    return best, tile_co


def _dw_kernel(x_hbm, g_ref, dw_ref, xs, sem, *, tile_h, wq, cin, n_i,
               slab):
    """dW accumulation over the (n, i) reduction grid.

    Grid order (co, ni) with co OUTERMOST: Pallas TPU only supports
    revisiting an accumulated output block on CONSECUTIVE grid steps, so
    the reduction dim ni = n*n_i + i must be innermost. Each co block
    zero-inits at ni==0, then accumulates; the slab DMA for ni+1 is
    started before ni's matmuls (double-buffered)."""
    ni = pl.program_id(1)
    total = pl.num_programs(1)

    def dma(ni_idx, slot):
        n = ni_idx // n_i
        i = ni_idx % n_i
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(i * tile_h * wq, slab)],
            xs.at[slot], sem.at[slot])

    @pl.when(ni == 0)
    def _():
        dma(0, 0).start()

    @pl.when(ni + 1 < total)
    def _():
        dma(ni + 1, (ni + 1) % 2).start()
    dma(ni, ni % 2).wait()

    @pl.when(ni == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    cur = xs.at[ni % 2]
    m = tile_h * wq
    g = g_ref[0].reshape(m, g_ref.shape[-1])
    for dy in range(3):
        for dx in range(3):
            patch = cur[dy * wq + dx: dy * wq + dx + m]  # static offset
            dw_ref[dy, dx] += jax.lax.dot_general(
                patch, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _conv3x3_dw(x: jax.Array, g: jax.Array) -> jax.Array:
    """dW = correlation of x with the cotangent g (same spatial shape)."""
    n, h, w_sp, cin_orig = x.shape
    cout = g.shape[-1]
    cin = cin_orig
    if cin < 128:  # sub-128 lanes crash the Mosaic compiler on this target
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, 128 - cin),))
        cin = 128

    wq = _round_up(w_sp + 2, 8)
    # same flat single-slab layout as the forward: 1 top + 2 bottom halo
    # rows, 1 left pad, right pad to wq (ops/pallas_conv.py)
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, wq - 1 - w_sp), (0, 0)))
    xflat = xp.reshape(n, (h + 3) * wq, cin)
    # zero-pad g's width-alignment columns so they contribute nothing
    gq = jnp.pad(g, ((0, 0), (0, 0), (0, wq - w_sp), (0, 0)))

    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    tile_h, tile_co = _pick_tiles_dw(h, wq, cin, cout, itemsize)
    n_i = h // tile_h
    slab = _round_up((tile_h + 2) * wq + 2, 8)
    grid = (cout // tile_co, n * n_i)

    kernel = functools.partial(_dw_kernel, tile_h=tile_h, wq=wq, cin=cin,
                               n_i=n_i, slab=slab)
    dw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, tile_h, wq, tile_co),
                         lambda co, ni: (ni, 0, 0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, cin, tile_co),
                               lambda co, ni: (0, 0, 0, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, cin, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, slab, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * h * wq * cin * cout,
            bytes_accessed=(xflat.size + gq.size) * itemsize
            + 9 * cin * cout * 4,
            transcendentals=0),
    )(xflat, gq.reshape(n * n_i, tile_h, wq, cout))
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
