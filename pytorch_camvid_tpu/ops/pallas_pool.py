"""Pallas TPU kernels: 2x2 max-pool-with-argmax and index-unpool.

SegNet's signature ops (models/segnet.py:79-80). The lax compositions in
ops/pooling.py are the reference implementations; these kernels fuse the
candidate max / argmax / compare-select logic into single VMEM passes.

Mosaic layout note: in-kernel reshape/strided-slice of the (H, W) plane
produces (2,128)-tiled intermediates whose i1 comparison masks cannot be
relayouted (observed: "Invalid relayout ... vector<...xi1>"). Both kernels
therefore take the four 2x2-quadrant views, pre-strided by XLA (free
fusion), and do only elementwise math in natural (8,128) layouts inside the
kernel:

- pool: max + first-win argmax over the 4 quadrant blocks;
- unpool: per-quadrant compare (saved flat index == own position) * value —
  the dense-gather inversion of torch's sparse scatter — emitted as 4
  quadrant outputs XLA interleaves back to (N, 2H2, 2W2, C).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quadrants(x: jax.Array):
    """Split NHWC into the 4 2x2-window candidates, each (N, H2, W2, C)."""
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, : 2 * h2, : 2 * w2, :]
    return (x[:, 0::2, 0::2, :], x[:, 0::2, 1::2, :],
            x[:, 1::2, 0::2, :], x[:, 1::2, 1::2, :])


def _pool_kernel(c00, c01, c10, c11, out_ref, idx_ref, *, w_in: int,
                 tile_h2: int):
    a, b, c, d = c00[0], c01[0], c10[0], c11[0]
    mx = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))
    # first-max tie-breaking in window scan order (0,0),(0,1),(1,0),(1,1).
    # Arithmetic form (no scalar-branch selects: Mosaic cannot relayout the
    # i1 masks a where-chain with replicated scalar operands produces), and
    # comparisons in f32 (bf16 compares are unsupported on some targets):
    # k = 0 if a>=mx else 1 if b>=mx else 2 if c>=mx else 3
    mx32 = mx.astype(jnp.float32)
    ia = (a.astype(jnp.float32) >= mx32).astype(jnp.int32)
    ib = (b.astype(jnp.float32) >= mx32).astype(jnp.int32)
    ic = (c.astype(jnp.float32) >= mx32).astype(jnp.int32)
    k = (1 - ia) * (1 + (1 - ib) * (1 + (1 - ic)))
    dy, dx = k // 2, k % 2
    h2, w2, ch = a.shape
    base_y = 2 * (pl.program_id(1) * tile_h2
                  + jax.lax.broadcasted_iota(jnp.int32, a.shape, 0))
    base_x = 2 * jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    out_ref[0] = mx
    idx_ref[0] = (base_y + dy) * w_in + (base_x + dx)


def _pick_tile(h2: int, w2: int, c: int, itemsize: int,
               nbufs: int) -> int:
    for t in range(h2, 0, -1):
        if h2 % t == 0 and nbufs * t * w2 * c * itemsize <= (8 << 20):
            return t
    raise ValueError(
        f"pool Pallas kernel: even a 1-row tile needs "
        f"{nbufs * w2 * c * itemsize} bytes of VMEM (> {8 << 20}) — input "
        f"too wide/deep for this kernel; use the XLA pooling path "
        f"(ops/pooling.py)")


@functools.partial(jax.jit, static_argnames=("interpret",))
def max_pool_2x2_argmax_pallas(x: jax.Array, interpret: bool = False
                               ) -> Tuple[jax.Array, jax.Array]:
    """Fused 2x2/stride-2 max pool with torch-convention flat indices."""
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    quads = _quadrants(x)

    # VMEM budget in input-itemsize units, x2 for Mosaic's double
    # buffering: 4 quadrant inputs + 1 pooled output + the int32 index
    # plane (4/itemsize units). Undercounting this OOMed the 16 MB scoped
    # vmem at (24,360,480,64) bf16 — observed on chip, round 3.
    # ... plus the kernel's f32/i32 stack temporaries (mx32, three
    # compare masks, k/dy/dx, two iota planes ~ 16 more input-units):
    # measured 27.5 MB at tile 18x240x64 where block buffers alone
    # modeled 7.7 MB. 36 units keeps the stack under half the 16 MB cap.
    nbufs = 36
    tile_h2 = _pick_tile(h2, w2, c, x.dtype.itemsize, nbufs=nbufs)
    grid = (n, h2 // tile_h2)
    spec = pl.BlockSpec((1, tile_h2, w2, c), lambda n, i: (n, i, 0, 0),
                        memory_space=pltpu.VMEM)

    kernel = functools.partial(_pool_kernel, w_in=w, tile_h2=tile_h2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, h2, w2, c), x.dtype),
            jax.ShapeDtypeStruct((n, h2, w2, c), jnp.int32),
        ],
        interpret=interpret,
    )(*quads)


def _unpool_kernel(x_ref, idx_ref, o00, o01, o10, o11, *, w_out: int,
                   tile_h2: int):
    xt = x_ref[0]
    it = idx_ref[0]
    yy = 2 * (pl.program_id(1) * tile_h2
              + jax.lax.broadcasted_iota(jnp.int32, xt.shape, 0))
    xx = 2 * jax.lax.broadcasted_iota(jnp.int32, xt.shape, 1)
    # mask * value instead of select (avoids i1 relayout pitfalls);
    # multiply in f32 since i1->bf16 extension is target-dependent
    xt32 = xt.astype(jnp.float32)

    def hit(flat):
        return ((it == flat).astype(jnp.float32) * xt32).astype(xt.dtype)

    o00[0] = hit(yy * w_out + xx)
    o01[0] = hit(yy * w_out + xx + 1)
    o10[0] = hit((yy + 1) * w_out + xx)
    o11[0] = hit((yy + 1) * w_out + xx + 1)


@functools.partial(jax.jit, static_argnames=("out_hw", "interpret"))
def max_unpool_2x2_pallas(x: jax.Array, idx: jax.Array,
                          out_hw: Tuple[int, int],
                          interpret: bool = False) -> jax.Array:
    """Fused index-unpool (dense-gather formulation); odd out_hw rows/cols
    beyond the even core were never pooled from and stay zero (torch
    output_size semantics, models/segnet.py:104)."""
    n, h2, w2, c = x.shape
    ho, wo = out_hw

    # x + int32 idx inputs, 4 quadrant outputs, double buffering,
    # plus f32 stack temporaries (xt32, iotas, per-phase masks)
    nbufs = 36
    tile_h2 = _pick_tile(h2, w2, c, x.dtype.itemsize, nbufs=nbufs)
    grid = (n, h2 // tile_h2)
    spec = pl.BlockSpec((1, tile_h2, w2, c), lambda n, i: (n, i, 0, 0),
                        memory_space=pltpu.VMEM)

    kernel = functools.partial(_unpool_kernel, w_out=wo, tile_h2=tile_h2)
    shape = jax.ShapeDtypeStruct((n, h2, w2, c), x.dtype)
    q00, q01, q10, q11 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec] * 4,
        out_shape=[shape] * 4,
        interpret=interpret,
    )(x, idx)
    # interleave quadrants -> (N, 2H2, 2W2, C), then pad odd remainders
    top = jnp.stack([q00, q01], axis=3).reshape(n, h2, 2 * w2, c)
    bot = jnp.stack([q10, q11], axis=3).reshape(n, h2, 2 * w2, c)
    out = jnp.stack([top, bot], axis=2).reshape(n, 2 * h2, 2 * w2, c)
    return jnp.pad(out, ((0, 0), (0, ho - 2 * h2), (0, wo - 2 * w2),
                         (0, 0)))
