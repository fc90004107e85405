"""Pallas TPU kernel: fused conv3x3(pad 1) + affine + ReLU.

The reference's hot block is Conv2d+BatchNorm2d+ReLU (models/unet.py:5-17,
models/segnet.py:5-17). In inference/serving mode BatchNorm is a per-channel
affine of the conv output, so the whole block folds into ONE kernel pass:

    out = relu( conv3x3(x, W) * A + B ),   A = gamma / sqrt(var + eps)
                                           B = (b - mean) * A + beta

Round-2 single-slab design (replaces the round-1 ``shift_stack`` layout that
materialized THREE width-shifted copies of the padded input in HBM —
VERDICT.md round-1 weak #2):

- the input is zero-padded once by XLA to (N, H+3, WQ, Cin) — 1 top / 2
  bottom halo rows, 1 left pad, right pad to an 8-aligned WQ >= W+2 — and
  viewed flat as (N, (H+3)*WQ, Cin);
- key fact (established by tools/mosaic_probes.py ON THIS TARGET): Mosaic
  supports *static* unaligned sublane slices, including as MXU operands.
  In the flattened row-major layout, the (dy, dx) conv tap is the slab
  slice at static offset dy*WQ + dx, so ALL NINE taps come from ONE slab:

      acc += slab[dy*WQ + dx : dy*WQ + dx + TH*WQ] @ W[dy, dx]

  (a width shift never crosses into real neighbor pixels because the >= 2
  pad columns sit between consecutive rows);
- grid = (N * H/TH, Cout/TCO); each slab is DMA'd once per (n, i) into one
  of TWO VMEM slots, and the NEXT (n, i) slab's DMA is started before the
  current tile's matmuls — double-buffered, so the HBM read overlaps MXU
  work (pallas_guide.md double-buffering pattern);
- per-tap matmuls are (TH*WQ, Cin) @ (Cin, TCO) MXU ops accumulated in
  f32 with the affine+ReLU epilogue fused before the single bf16 store;
- HBM traffic per conv: ~1x input read + 1x output write (vs 4x input
  reads + 3x extra writes for the round-1 stack layout).

Training-mode BatchNorm needs global batch statistics of the conv output,
which no single-pass tile kernel can produce; the training path therefore
uses the XLA conv (ops/conv.py) and this kernel serves eval/predict/serving
(enable with use_pallas=True on the model apply functions). The training
custom-VJP kernels (ops/pallas_conv_train.py) reuse this kernel for their
forward/dgrad and the same single-slab layout for dW.

Hardware validation status: see HARDWARE.md (validation ledger).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_camvid_tpu.ops.conv import BN_EPS


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tile_h(h: int, wp: int, cin: int,
                 bytes_budget: int = 6 << 20, itemsize: int = 2) -> int:
    """Largest TILE_H dividing h whose halo slab fits the VMEM budget.

    Raises when even the minimum 3-row slab busts the budget (over-wide W or
    Cin) instead of letting the kernel OOM VMEM with an opaque Mosaic error.
    """
    row_bytes = wp * cin * itemsize
    if 3 * row_bytes > bytes_budget:
        raise ValueError(
            f"conv3x3 Pallas kernel: one 3-row halo slab is "
            f"{3 * row_bytes} bytes (padded width {wp} x Cin {cin} x "
            f"{itemsize}B) > the {bytes_budget}-byte VMEM budget — the "
            f"input is too wide/deep for this kernel; use the XLA conv "
            f"(use_pallas=False) or shard W spatially (parallel/spatial.py)")
    best = 1
    for t in range(1, h + 1):
        if h % t == 0 and (t + 2) * row_bytes <= bytes_budget:
            best = t
    return best


def _pick_tile_co(cout: int, cin: int, bytes_budget: int = 4 << 20) -> int:
    """Largest Cout tile (multiple of 128 when possible) fitting weights."""
    for t in (512, 256, 128):
        if cout % t == 0 and 9 * cin * t * 2 <= bytes_budget:
            return t
    return cout  # small layers (<=128 or odd sizes like 12)


def _pick_tiles(h: int, wq: int, cin: int, cout: int, itemsize: int,
                budget: int = 12 << 20):
    """(tile_h, tile_co) for the single-slab kernel with FULL VMEM
    accounting: 2 slab slots + pipeline-double-buffered weight and output
    blocks + the f32 accumulator. Raises with a clear message when nothing
    fits (the XLA conv is the fallback path)."""
    tile_co = _pick_tile_co(cout, cin, bytes_budget=(5 << 20) // 2)

    def usage(th, tco):
        slab = (_round_up((th + 2) * wq + 2, 8)) * cin * itemsize
        wbytes = 9 * cin * tco * itemsize
        obytes = th * wq * tco * itemsize
        acc = th * wq * tco * 4
        # 3 persistent width-shifted slab copies + a relayout temporary
        shifted = 3 * (th + 2) * wq * cin * itemsize
        slice_tmp = (th + 2) * wq * cin * itemsize
        return 2 * slab + shifted + slice_tmp + 2 * wbytes \
            + 2 * obytes + acc

    best = 0
    for th in range(1, h + 1):
        if h % th == 0 and usage(th, tile_co) <= budget:
            best = th
    if best == 0:
        raise ValueError(
            f"conv3x3 Pallas kernel: no tile of H={h} fits VMEM "
            f"(W'={wq}, Cin={cin}, Cout tile={tile_co}: minimum usage "
            f"{usage(1, tile_co)} bytes > {budget}) — use the XLA conv "
            f"(use_pallas=False) or shard W spatially "
            f"(parallel/spatial.py)")
    return best, tile_co


def fold_bn_affine(params, state) -> Tuple[jax.Array, jax.Array]:
    """Fold conv bias + BN running stats into (A, B) per channel."""
    inv = jax.lax.rsqrt(state["var"] + BN_EPS)
    a = params["scale"] * inv
    b = (params["b"] - state["mean"]) * a + params["bias"]
    return a.astype(jnp.float32), b.astype(jnp.float32)


def _conv_kernel(x_hbm, w_ref, ab_ref, out_ref, xs, xsh, sem, *,
                 tile_h: int, wq: int, cin: int, n_i: int, slab: int,
                 relu: bool = True):
    """Single-slab conv tap loop; see module docstring.

    x_hbm: (N, (H+3)*WQ, Cin) flat padded input in ANY/HBM space.
    xs: (2, SLAB, Cin) double-buffered raw-slab DMA landing scratch.
    xsh: (3, (TH+2)*WQ, Cin) width-shifted slab copies, built ONCE per slab
      (unaligned sublane slices cost a relayout copy each; doing the three
      dx shifts up front at co==0 turns all NINE tap reads into ALIGNED
      slices at dy*WQ — measured 9-relayouts-per-tile was slower than XLA).
    Grid: (N * H/TH, Cout/TCO); dim 0 walks (n, i) row tiles so consecutive
    programs reuse/advance the slab; dim 1 walks Cout tiles.
    """
    ni = pl.program_id(0)
    co = pl.program_id(1)
    total = pl.num_programs(0)
    sh_rows = (tile_h + 2) * wq

    def dma(ni_idx, slot):
        # slab rows for (n, i): flat rows [ i*TH*WQ , +SLAB ) of image n
        n = ni_idx // n_i
        i = ni_idx % n_i
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(i * tile_h * wq, slab)],
            xs.at[slot], sem.at[slot])

    @pl.when((ni == 0) & (co == 0))
    def _():
        dma(0, 0).start()

    @pl.when(co == 0)
    def _():
        # overlap: start the NEXT tile's slab load before computing this one
        @pl.when(ni + 1 < total)
        def _():
            dma(ni + 1, (ni + 1) % 2).start()
        dma(ni, ni % 2).wait()
        cur = xs.at[ni % 2]
        for dx in range(3):
            xsh[dx] = cur[dx: dx + sh_rows]  # one relayout per dx shift

    tile_co = w_ref.shape[-1]
    acc = jnp.zeros((tile_h * wq, tile_co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xsh[dx, dy * wq: (dy + tile_h) * wq]  # aligned slice
            acc += jnp.dot(patch, w_ref[dy, dx],
                           preferred_element_type=jnp.float32)
    a = ab_ref[0]  # (tile_co,)
    b = ab_ref[1]
    y = acc * a + b
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.reshape(tile_h, wq, tile_co).astype(out_ref.dtype)


def _conv3x3_impl(x: jax.Array, w: jax.Array, a: jax.Array,
                  b: jax.Array, interpret: bool = False,
                  tile_h: int = 0, tile_co: int = 0,
                  relu: bool = True):
    """Unjitted kernel invocation (the public wrapper jits it; the training
    forward in ops/pallas_conv_train.py calls this directly so it traces
    inside the caller's jit)."""
    n, h, w_sp, cin = x.shape
    cout = w.shape[-1]
    dtype = x.dtype

    if cin < 128:
        # sub-128 lane input channels crash the Mosaic compiler on this
        # target; zero-pad the contraction dim (extra MXU work on the two
        # shallow layers only — they are <5% of model FLOPs)
        pad_c = 128 - cin
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
        cin = 128

    wq = _round_up(w_sp + 2, 8)      # left pad 1 + >=1 right pad, 8-aligned
    # pad: 1 top + 2 bottom halo rows (the dy=2 tap of the last output row
    # reads one row past H+2 in the flattened layout), 1 left, rest right
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, wq - 1 - w_sp), (0, 0)))
    xflat = xp.reshape(n, (h + 3) * wq, cin)

    itemsize = 2 if dtype == jnp.bfloat16 else 4
    auto_h, auto_co = _pick_tiles(h, wq, cin, cout, itemsize)
    tile_h = tile_h or auto_h
    tile_co = tile_co or auto_co
    n_i = h // tile_h
    # slab rows: TH+2 halo rows plus the +2 flat overrun of the (2,2) tap,
    # rounded to 8 for clean tiling (always in-bounds: (h+3)*wq total rows)
    slab = _round_up((tile_h + 2) * wq + 2, 8)
    grid = (n * n_i, cout // tile_co)

    ab = jnp.stack([a, b]).astype(jnp.float32)  # (2, Cout)

    kernel = functools.partial(_conv_kernel, tile_h=tile_h, wq=wq, cin=cin,
                               n_i=n_i, slab=slab, relu=relu)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # flat slab, manual DMA
            pl.BlockSpec((3, 3, cin, tile_co),
                         lambda ni, co: (0, 0, 0, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_co), lambda ni, co: (0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, wq, tile_co),
            lambda ni, co: (ni, 0, 0, co),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * n_i, tile_h, wq, cout), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, slab, cin), dtype),
            pltpu.VMEM((3, (tile_h + 2) * wq, cin), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * h * wq * cin * cout,
            bytes_accessed=(xflat.size + w.size) * itemsize
            + n * h * wq * cout * itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xflat, w.astype(dtype), ab)
    out = out.reshape(n, h, wq, cout)
    # columns 0..W-1 are the valid outputs (the tap offsets already index
    # the left-padded slab); the rest is right-pad garbage
    return out[:, :, :w_sp, :]


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_h", "tile_co",
                                    "relu"))
def conv3x3_bn_relu_pallas(x: jax.Array, w: jax.Array, a: jax.Array,
                           b: jax.Array, interpret: bool = False,
                           tile_h: int = 0, tile_co: int = 0,
                           relu: bool = True):
    """Fused conv3x3(pad1)+affine+ReLU. x: (N,H,W,Cin) bf16/f32;
    w: (3,3,Cin,Cout); a,b: (Cout,) f32. Returns (N,H,W,Cout) in x.dtype.
    tile_h/tile_co override the VMEM-model tile picker (0 = auto);
    relu=False skips the clamp (the training forward reuses this kernel
    with a=1, b=0 — ops/pallas_conv_train.py)."""
    return _conv3x3_impl(x, w, a, b, interpret=interpret, tile_h=tile_h,
                         tile_co=tile_co, relu=relu)


def conv_bn_relu_apply_pallas(params, state, x: jax.Array,
                              interpret: bool = False):
    """Drop-in eval-mode replacement for ops.conv.conv_bn_relu_apply
    (train=False): same math, one fused kernel pass."""
    a, b = fold_bn_affine(params, state)
    y = conv3x3_bn_relu_pallas(x, params["w"].astype(x.dtype), a, b,
                               interpret=interpret)
    return y, state
