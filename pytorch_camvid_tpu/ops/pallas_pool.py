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

import numpy as np

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


# ---------------------------------------------------------------------------
# Packed-layout phase pair (round 3). The quadrant kernels above make XLA
# materialize 4 strided-slice copies of the full input before the kernel
# ever runs (and re-interleave 4 outputs after the unpool) — measured at
# 31.8 ms for SegNet's stage-1 pool+unpool pair at b24, WORSE than the
# pure-XLA argmax pair's 19.7 (run_artifacts/probe_pool_pallas_b24.jsonl
# vs probe_pool_b24.jsonl; HBM bound 2.3). This pair instead feeds the
# kernel the input under two FREE reshapes,
#
#     (N, H, W, C) -> (N, H2, 2, W2, 2C)      (row-major bitcast views)
#
# so the 2x2 window structure is addressable without any strided copy:
# the H pair is a unit index on dim 2, and the W pair is the lane halves
# [..:C] / [C..] of a 2C-lane register (C=64 -> exactly one 128-lane
# vreg). Index planes are 2-bit phases stored as int8 (k = 2*dy + dx,
# 1/4 the bytes of torch's flat int32), and the unpool writes the big
# domain through the same packed view. Traffic is the true minimum:
# pool reads X + writes X/4 + X/8; unpool the mirror.
# ---------------------------------------------------------------------------


def _pool_packed_kernel(x_ref, out_ref, k_ref, *, c: int):
    xt = x_ref[0]                          # (TH, 2, W2, 2C)
    a = xt[:, 0].astype(jnp.float32)       # even input rows (TH, W2, 2C)
    b = xt[:, 1].astype(jnp.float32)       # odd input rows
    a0, a1 = a[..., :c], a[..., c:]        # W pair = lane halves
    b0, b1 = b[..., :c], b[..., c:]
    # torch first-max tie order (0,0),(0,1),(1,0),(1,1): within each row
    # the right column wins only if strictly greater; row 1 wins only if
    # strictly greater (compares in f32 — exact for bf16 inputs; int
    # arithmetic instead of where-chains, which hit Mosaic i1 relayouts)
    dx0 = (a1 > a0).astype(jnp.int32)
    dx1 = (b1 > b0).astype(jnp.int32)
    row0 = jnp.maximum(a0, a1)
    row1 = jnp.maximum(b0, b1)
    dy = (row1 > row0).astype(jnp.int32)
    pooled = jnp.maximum(row0, row1)
    k = dy * (2 + dx1) + (1 - dy) * dx0
    out_ref[0] = pooled.astype(out_ref.dtype)
    k_ref[0] = k.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def max_pool_2x2_phase_packed(x: jax.Array, interpret: bool = False
                              ) -> Tuple[jax.Array, jax.Array]:
    """Fused 2x2/stride-2 max pool -> (pooled, int8 phase k in [0,4)).

    Drop-in for ops/pooling.py's ``max_pool_2x2_argmax_phase`` (bit-equal
    pooled + k, torch tie order); floors odd spatial dims like torch."""
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    xr = x[:, : 2 * h2, : 2 * w2, :].reshape(n, h2, 2, w2, 2 * c)

    # VMEM per H2-row in input units (t * w2 * 2c * itemsize): in 1 + out
    # 0.25+0.0625, x2 double buffering, + ~10 f32 stack planes of
    # (t, w2, c) = 10 * (itemsize==2 and 1.0 or 0.5) input units
    tile_h2 = _pick_tile(h2, w2, 2 * c, x.dtype.itemsize, nbufs=16)
    grid = (n, h2 // tile_h2)
    in_spec = pl.BlockSpec((1, tile_h2, 2, w2, 2 * c),
                           lambda n, i: (n, i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, tile_h2, w2, c), lambda n, i: (n, i, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_pool_packed_kernel, c=c)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, h2, w2, c), x.dtype),
            jax.ShapeDtypeStruct((n, h2, w2, c), jnp.int8),
        ],
        interpret=interpret,
    )(xr)


def _unpool_packed_kernel(x_ref, k_ref, o_ref, *, c: int):
    xt = x_ref[0].astype(jnp.float32)      # (TH, W2, C)
    kt = k_ref[0].astype(jnp.int32)

    def ph(j):
        return (kt == j).astype(jnp.float32) * xt

    # output phase (dy, dx) holds x where k selected it; W phases pack
    # into lane halves, H phases into the unit dim of the packed view
    r0 = jnp.concatenate([ph(0), ph(1)], axis=-1)   # (TH, W2, 2C)
    r1 = jnp.concatenate([ph(2), ph(3)], axis=-1)
    o_ref[0, :, 0] = r0.astype(o_ref.dtype)
    o_ref[0, :, 1] = r1.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_hw", "interpret"))
def max_unpool_2x2_phase_packed(x: jax.Array, k: jax.Array,
                                out_hw: Tuple[int, int],
                                interpret: bool = False) -> jax.Array:
    """Invert max_pool_2x2_phase_packed through the packed output view;
    odd out_hw rows/cols beyond the even core were never pooled from and
    stay zero (torch output_size semantics, models/segnet.py:104)."""
    n, h2, w2, c = x.shape
    ho, wo = out_hw
    tile_h2 = _pick_tile(h2, w2, 2 * c, x.dtype.itemsize, nbufs=16)
    grid = (n, h2 // tile_h2)
    in_spec = pl.BlockSpec((1, tile_h2, w2, c), lambda n, i: (n, i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, tile_h2, 2, w2, 2 * c),
                            lambda n, i: (n, i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_unpool_packed_kernel, c=c)
    packed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec, in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, h2, 2, w2, 2 * c), x.dtype),
        interpret=interpret,
    )(x, k)
    out = packed.reshape(n, 2 * h2, 2 * w2, c)     # free (row-major)
    pad_h, pad_w = max(ho - 2 * h2, 0), max(wo - 2 * w2, 0)
    if pad_h or pad_w:
        out = jnp.pad(out, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return out[:, :ho, :wo, :]


def _unpool_grad_kernel(g_ref, k_ref, o_ref, *, c: int):
    gt = g_ref[0]                          # (TH, 2, W2, 2C)
    kt = k_ref[0].astype(jnp.int32)
    g0 = gt[:, 0].astype(jnp.float32)
    g1 = gt[:, 1].astype(jnp.float32)
    q = (g0[..., :c], g0[..., c:], g1[..., :c], g1[..., c:])
    sel = sum((kt == j).astype(jnp.float32) * q[j] for j in range(4))
    o_ref[0] = sel.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _unpool_phase_packed_grad(g: jax.Array, k: jax.Array,
                              interpret: bool = False) -> jax.Array:
    """VJP of the packed unpool wrt x: gather g at each window's phase —
    structurally the pool kernel with the argmax replayed from k."""
    n, h2, w2, c = k.shape
    gr = g[:, : 2 * h2, : 2 * w2, :].reshape(n, h2, 2, w2, 2 * c)
    tile_h2 = _pick_tile(h2, w2, 2 * c, g.dtype.itemsize, nbufs=16)
    grid = (n, h2 // tile_h2)
    g_spec = pl.BlockSpec((1, tile_h2, 2, w2, 2 * c),
                          lambda n, i: (n, i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, tile_h2, w2, c), lambda n, i: (n, i, 0, 0),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(_unpool_grad_kernel, c=c)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[g_spec, s_spec],
        out_specs=s_spec,
        out_shape=jax.ShapeDtypeStruct((n, h2, w2, c), g.dtype),
        interpret=interpret,
    )(gr, k)


# ---- natural-layout unpool: the packed output view costs a tiled-layout
# relayout copy of the BIG tensor after the kernel ((W2, 2C) tiles order
# elements differently than (W, C) tiles even though linear memory
# agrees — observed as a bf16[24,360,480,64] %copy in HLO, ~2.7 ms of
# pure relayout at stage 1 b24 on top of the 1.3 ms copy bound). This
# variant writes blocks of the (N, H2, 2, W, C) view instead — a LEADING-
# dim regroup of natural NHWC that leaves the tiled (W, C) plane intact,
# i.e. a true bitcast — and interleaves the W pairs INSIDE the kernel
# with a stack+merge (the one sublane restructuring Mosaic handles; the
# splitting direction, needed for a natural-input pool, is rejected as an
# unsupported >2D gather — measured, see HARDWARE.md round 3).


@functools.partial(jax.jit, static_argnames=("out_hw", "interpret"))
def max_unpool_2x2_phase_nat(x: jax.Array, k: jax.Array,
                             out_hw: Tuple[int, int],
                             interpret: bool = False) -> jax.Array:
    """Invert max_pool_2x2_phase_packed with natural-layout output blocks
    (in-kernel W interleave, free H regroup — no relayout copies); odd
    out_hw rows/cols stay zero (torch output_size, models/segnet.py:104)."""
    n, h2, w2, c = x.shape
    ho, wo = out_hw
    w = 2 * w2
    tile_h2 = _pick_tile(h2, w2, 2 * c, x.dtype.itemsize, nbufs=16)

    def kern(x_ref, k_ref, o_ref):
        xt = x_ref[0].astype(jnp.float32)      # (TH, W2, C)
        kt = k_ref[0].astype(jnp.int32)

        def ph(j):
            return (kt == j).astype(jnp.float32) * xt

        r0 = jnp.stack([ph(0), ph(1)], axis=2).reshape(tile_h2, w, c)
        r1 = jnp.stack([ph(2), ph(3)], axis=2).reshape(tile_h2, w, c)
        o_ref[0, :, 0] = r0.astype(o_ref.dtype)
        o_ref[0, :, 1] = r1.astype(o_ref.dtype)

    sm = pl.BlockSpec((1, tile_h2, w2, c), lambda n, i: (n, i, 0, 0),
                      memory_space=pltpu.VMEM)
    big = pl.BlockSpec((1, tile_h2, 2, w, c), lambda n, i: (n, i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern, grid=(n, h2 // tile_h2), in_specs=[sm, sm], out_specs=big,
        out_shape=jax.ShapeDtypeStruct((n, h2, 2, w, c), x.dtype),
        interpret=interpret,
    )(x, k)
    out = out.reshape(n, 2 * h2, w, c)         # leading regroup: bitcast
    pad_h, pad_w = max(ho - 2 * h2, 0), max(wo - 2 * w2, 0)
    if pad_h or pad_w:
        out = jnp.pad(out, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return out[:, :ho, :wo, :]


# ---- MXU-selection variants: the packed INPUT view above still costs a
# relayout copy of the big tensor before the kernel (its tiled plane
# changes (W,C)->(W2,2C)); measured ~4.3 ms at stage 1 b24 against a
# ~1.7 ms kernel. These variants read blocks of the FREE H-regroup view
# (N, H2, 2, W, C) instead and do the W-pair selection ON THE MXU: one
# 0/1 selection matrix per parity, contracted over W with [row_a|row_b]
# lane-concatenated so a single (W2, W) @ (W, 2C) dot yields both H rows'
# selected columns (full 128+ lanes of N per dot). Selection by matmul
# is EXACT (one nonzero per output row, f32 accumulation) — but only at
# Precision.HIGHEST: the TPU MXU's default f32 matmul path rounds inputs
# to bf16 (observed on chip: outputs were bf16-quantized), while HIGHEST
# multi-pass decomposition reconstructs x*1.0 exactly; bf16 inputs are a
# single exact pass either way, so the production (bf16) cost is
# unchanged. Measured
# faster than packed+relayout at stage 1 (7.1 vs 8.6 ms in-chain); the
# production train pair below uses them so the pool system has ZERO
# XLA-side relayouts: MXU pool fwd, nat unpool (pool bwd + unpool fwd),
# MXU phase-gather (unpool bwd).


def _sel_matrices(w2: int, w: int, dtype):
    se = np.zeros((w2, w), np.float32)
    so = np.zeros((w2, w), np.float32)
    se[np.arange(w2), 2 * np.arange(w2)] = 1.0
    so[np.arange(w2), 2 * np.arange(w2) + 1] = 1.0
    return jnp.asarray(se, dtype), jnp.asarray(so, dtype)


def _pool_mxu_kernel(se_ref, so_ref, x_ref, o_ref, k_ref, *, tile_h2: int,
                     c: int):
    se = se_ref[...]
    so = so_ref[...]
    # HIGHEST keeps f32 inputs exact (default MXU f32 rounds to bf16 —
    # observed on chip); Mosaic rejects HIGHEST for bf16 operands ("Bad
    # lhs type"), where the single pass is already exact.
    prec = (jax.lax.Precision.HIGHEST if se.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    for i in range(tile_h2):
        ab = jnp.concatenate([x_ref[0, i, 0], x_ref[0, i, 1]],
                             axis=-1)      # (W, 2C) = [row 2i | row 2i+1]
        e = dot(se, ab)                    # (W2, 2C) f32: [a0 | b0]
        o = dot(so, ab)                    # (W2, 2C) f32: [a1 | b1]
        a0, b0 = e[:, :c], e[:, c:]
        a1, b1 = o[:, :c], o[:, c:]
        dx0 = (a1 > a0).astype(jnp.int32)  # torch scan order, first-win
        dx1 = (b1 > b0).astype(jnp.int32)
        r0 = jnp.maximum(a0, a1)
        r1 = jnp.maximum(b0, b1)
        dy = (r1 > r0).astype(jnp.int32)
        o_ref[0, i] = jnp.maximum(r0, r1).astype(o_ref.dtype)
        k_ref[0, i] = (dy * (2 + dx1) + (1 - dy) * dx0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def max_pool_2x2_phase_mxu(x: jax.Array, interpret: bool = False
                           ) -> Tuple[jax.Array, jax.Array]:
    """2x2/stride-2 max pool -> (pooled, int8 phase); bit-equal to
    max_pool_2x2_phase_packed, natural-layout input (no relayout)."""
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    xh = x[:, : 2 * h2, : 2 * w2, :].reshape(n, h2, 2, 2 * w2, c)
    se, so = _sel_matrices(w2, 2 * w2, x.dtype)
    tile_h2 = _pick_tile(h2, w2, 2 * c, x.dtype.itemsize, nbufs=16)
    sel_spec = pl.BlockSpec((w2, 2 * w2), lambda n, i: (0, 0),
                            memory_space=pltpu.VMEM)
    in_spec = pl.BlockSpec((1, tile_h2, 2, 2 * w2, c),
                           lambda n, i: (n, i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, tile_h2, w2, c), lambda n, i: (n, i, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_pool_mxu_kernel, tile_h2=tile_h2, c=c)
    return pl.pallas_call(
        kernel, grid=(n, h2 // tile_h2),
        in_specs=[sel_spec, sel_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((n, h2, w2, c), x.dtype),
                   jax.ShapeDtypeStruct((n, h2, w2, c), jnp.int8)],
        interpret=interpret,
    )(se, so, xh)


def _unpool_grad_mxu_kernel(se_ref, so_ref, g_ref, k_ref, o_ref, *,
                            tile_h2: int, c: int):
    se = se_ref[...]
    so = so_ref[...]
    # HIGHEST keeps f32 inputs exact (default MXU f32 rounds to bf16 —
    # observed on chip); Mosaic rejects HIGHEST for bf16 operands ("Bad
    # lhs type"), where the single pass is already exact.
    prec = (jax.lax.Precision.HIGHEST if se.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    for i in range(tile_h2):
        g01 = jnp.concatenate([g_ref[0, i, 0], g_ref[0, i, 1]],
                              axis=-1)     # (W, 2C) = [g row 2i | 2i+1]
        e = dot(se, g01)                   # (W2, 2C): [q0 | q2]
        o = dot(so, g01)                   # (W2, 2C): [q1 | q3]
        q = (e[:, :c], o[:, :c], e[:, c:], o[:, c:])
        kt = k_ref[0, i].astype(jnp.int32)
        sel = sum((kt == j).astype(jnp.float32) * q[j] for j in range(4))
        o_ref[0, i] = sel.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _unpool_phase_grad_mxu(g: jax.Array, k: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """VJP of the unpool wrt x: gather g at each window's saved phase —
    natural-layout g (no relayout); MXU selection like the pool."""
    n, h2, w2, c = k.shape
    gh = g[:, : 2 * h2, : 2 * w2, :].reshape(n, h2, 2, 2 * w2, c)
    se, so = _sel_matrices(w2, 2 * w2, g.dtype)
    tile_h2 = _pick_tile(h2, w2, 2 * c, g.dtype.itemsize, nbufs=16)
    sel_spec = pl.BlockSpec((w2, 2 * w2), lambda n, i: (0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, tile_h2, 2, 2 * w2, c),
                          lambda n, i: (n, i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, tile_h2, w2, c), lambda n, i: (n, i, 0, 0),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(_unpool_grad_mxu_kernel, tile_h2=tile_h2,
                               c=c)
    return pl.pallas_call(
        kernel, grid=(n, h2 // tile_h2),
        in_specs=[sel_spec, sel_spec, g_spec, s_spec],
        out_specs=s_spec,
        out_shape=jax.ShapeDtypeStruct((n, h2, w2, c), g.dtype),
        interpret=interpret,
    )(se, so, gh, k)


# ---- training pair: the same kernels with custom VJPs (pool backward IS
# the unpool kernel on the saved phase; unpool backward is the phase
# gather) — so SegNet's backward pays the same minimal HBM traffic


def _pool_fwd_impl():
    """Production pool forward / unpool backward: "mxu" (natural-layout
    MXU selection, no relayout — default) or "packed" (packed-view
    kernel, one input relayout). PCT_POOL_SEL overrides; both bit-equal."""
    import os
    return os.environ.get("PCT_POOL_SEL", "mxu")


@jax.custom_vjp
def pool_phase_packed_train(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    if _pool_fwd_impl() == "packed":
        return max_pool_2x2_phase_packed(x)
    return max_pool_2x2_phase_mxu(x)


def _pool_train_fwd(x):
    if _pool_fwd_impl() == "packed":
        pooled, k = max_pool_2x2_phase_packed(x)
    else:
        pooled, k = max_pool_2x2_phase_mxu(x)
    return (pooled, k), (k, x.shape)


def _pool_train_bwd(res, g):
    k, xshape = res
    gp = g[0]                  # cotangent wrt k (int8) is symbolic zero
    gx = max_unpool_2x2_phase_nat(gp, k, (xshape[1], xshape[2]))
    return (gx,)


pool_phase_packed_train.defvjp(_pool_train_fwd, _pool_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def unpool_phase_packed_train(x: jax.Array, k: jax.Array,
                              out_hw: Tuple[int, int]) -> jax.Array:
    return max_unpool_2x2_phase_nat(x, k, out_hw)


def _unpool_train_fwd(x, k, out_hw):
    return max_unpool_2x2_phase_nat(x, k, out_hw), k


def _unpool_train_bwd(out_hw, k, g):
    if _pool_fwd_impl() == "packed":
        return (_unpool_phase_packed_grad(g, k), None)
    return (_unpool_phase_grad_mxu(g, k), None)


unpool_phase_packed_train.defvjp(_unpool_train_fwd, _unpool_train_bwd)


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
