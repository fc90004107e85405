"""Pallas TPU kernel: H-pair lane-packed conv3x3 for shallow channels.

Targets the full-resolution Cin=Cout=64 convs (reference:
``models/unet.py:40-65`` stage-1 pair, ``models/segnet.py:23-49`` VGG
stem block) where XLA's direct conv runs at ~44 TF/s = 22% of peak
(PERF.md per-shape table): with C=64 the MXU's 128-wide K and N
dimensions are both half empty, and every reformulation that fixes the
occupancy by changing the HBM layout (space-to-depth, wgroup, packed
views) loses its win to the relayout copy of a 530 MB activation
(PERF.md round-3 ledger).

This kernel fills BOTH MXU dimensions with ZERO XLA-side relayouts by
packing vertically adjacent output rows into the lane dimension — the
exact I/O pattern the MXU-selection pool system proved relayout-free
(ops/pallas_pool.py):

- input is read through the FREE H-regroup view (N, H2+, 2*WQ, C) (a
  leading-dim regroup of the padded NHWC layout with the raw-row pair
  folded into sublanes; no copy), and each packed row pair is
  lane-concatenated IN VMEM to (WQ, 2C) — 128 lanes at C=64;
- the 3x3 conv becomes NINE taps over (packed-row, dx) offsets, each a
  (TH2*WQ, 2C) @ (2C, 2Co) MXU matmul against a block-structured pair
  kernel M (``_build_pair_taps``): for output pair [y(2r) | y(2r+1)],

      M[0,dx] = [[0,      0     ],   (P_{r-1} = [x(2r-2)|x(2r-1)])
                 [w[0,dx], 0    ]]
      M[1,dx] = [[w[1,dx], w[0,dx]],  (P_r = [x(2r)|x(2r+1)])
                 [w[2,dx], w[1,dx]]]
      M[2,dx] = [[0,      w[2,dx]],   (P_{r+1} = [x(2r+2)|x(2r+3)])
                 [0,      0     ]]

  so the executed MACs are 2x the true conv FLOPs (the zero blocks) but
  run at full 128-lane K *and* N occupancy — a win whenever the
  occupancy gain exceeds 2x, i.e. exactly the C<=64 family;
- the flattened packed slab reuses the single-slab tap addressing of
  ops/pallas_conv.py (tap (dρ, dx) = static slice at dρ*WQ + dx after
  the three hoisted dx shifts);
- the 3-packed-row halo is delivered by a SECOND BlockSpec on the same
  input at block index i+1 (manual memref_slice DMA requires
  128-aligned lane dims, which a C=64 HBM array is not — measured,
  HARDWARE.md round-3 ledger), costing one extra read of the input
  stream; BlockSpec pipelining double-buffers both streams;
- the output block is the (N, H2, 2*WQ, Co) natural-output view — two
  aligned sublane-half stores — which the caller merges back to
  (N, H, W, Co) as a pure reshape (the max_unpool_2x2_phase_nat
  pattern).

Measured on chip before adoption; see PERF.md (round 3, pair-packed
conv) for the verdict. Correctness is oracle-tested against the XLA
conv in interpret mode (tests/test_pallas_conv_pair.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_camvid_tpu.ops.pallas_conv import _round_up


def _build_pair_taps(w: jax.Array) -> jax.Array:
    """(3,3,Cin,Cout) conv kernel -> (3,3,2Cin,2Cout) pair-tap matrices.

    Tap dρ ∈ {0,1,2} addresses packed input row r-1 / r / r+1 for output
    packed row r; see the block layout in the module docstring. Built by
    XLA outside the kernel (tiny: 9*(2C)*(2Co) elements)."""
    c, co = w.shape[2], w.shape[3]
    m = jnp.zeros((3, 3, 2 * c, 2 * co), w.dtype)
    m = m.at[0, :, c:, :co].set(w[0])
    m = m.at[1, :, :c, :co].set(w[1])
    m = m.at[1, :, :c, co:].set(w[0])
    m = m.at[1, :, c:, :co].set(w[2])
    m = m.at[1, :, c:, co:].set(w[1])
    m = m.at[2, :, :c, co:].set(w[2])
    return m


def _pick_tile_h2(h2: int, wq: int, c: int, co: int, itemsize: int,
                  budget: int = 12 << 20, kstack: bool = False) -> int:
    """Largest TH2 dividing h2 with full VMEM accounting (2 pipelined
    input streams x 2 buffers + the concat/flatten temporaries + 3
    hoisted dx-shift copies + f32 accumulator + 2 output blocks + the
    pair-tap weights). Raises when nothing fits."""

    def usage(th2):
        blocks = 2 * (th2 + 3) * 2 * wq * c * itemsize     # a/b streams
        concat_tmp = 2 * (th2 + 3) * wq * 2 * c * itemsize  # rows + S
        shifted = 3 * (th2 + 2) * wq * 2 * c * itemsize     # dx shifts
        acc = th2 * wq * 2 * co * 4
        out = 2 * th2 * 2 * wq * co * itemsize              # 2 pipeline
        wbytes = 2 * 9 * 2 * c * 2 * co * itemsize
        if kstack:  # the lane-stacked (TH2*WQ, 9*2C) dot operand
            shifted = th2 * wq * 9 * 2 * c * itemsize
        return blocks + concat_tmp + shifted + acc + out + wbytes

    best = 0
    # TH2 % 3 == 0 lets the 3-row halo be its own evenly-dividing
    # BlockSpec (offset (i+1)*TH2 is then a multiple of 3), so the halo
    # stream reads 3/TH2 of the input instead of all of it again
    for t in range(3, h2 + 1):
        if h2 % t == 0 and t % 3 == 0 and usage(t) <= budget:
            best = t
    if best == 0:  # fall back to any divisor >= 3 (full-block halo)
        for t in range(3, h2 + 1):
            if h2 % t == 0 and usage(t) <= budget:
                best = t
    if best == 0:
        raise ValueError(
            f"pair conv3x3: no tile of H2={h2} fits VMEM (W'={wq}, C={c}, "
            f"Co={co}: min usage {usage(1)} bytes > {budget}) — use the "
            f"XLA conv")
    return best


def _pair_kernel(m_ref, ab_ref, a_ref, b_ref, out_ref, ssh, *,
                 tile_h2: int, wq: int, c: int, co: int, relu: bool,
                 control_aligned: bool = False):
    """a_ref: this tile's TH2 packed rows; b_ref: the 3-row bottom-halo
    block (the TH2%3==0 tiling makes it addressable as its own
    BlockSpec, so the input stream is read ~(1+3/TH2)x, not 2x). Both
    (1, rows, 2*WQ, C): raw row 2r is sublanes [:WQ], row 2r+1 is [WQ:]
    (the fold keeps memory order). ssh: (3, (TH2+2)*WQ, 2C) hoisted
    dx-shifted packed slabs. control_aligned skips the dx shifts
    (WRONG math — the measurement control arm isolating shift cost)."""
    rows = jnp.concatenate([a_ref[0], b_ref[0, :3]],
                           axis=0)          # (TH2+3, 2WQ, C)
    s = jnp.concatenate([rows[:, :wq], rows[:, wq:]],
                        axis=-1)            # (TH2+3, WQ, 2C)
    sflat = s.reshape((tile_h2 + 3) * wq, 2 * c)
    sh_rows = (tile_h2 + 2) * wq
    acc = jnp.zeros((tile_h2 * wq, 2 * co), jnp.float32)
    if control_aligned == "kstack":
        # REAL math, single dot: store the nine tap views into a
        # (TH2*WQ, 9*2C) lane-stacked scratch (ssh doubles as it; a
        # direct lane-concat of sublane-shifted views is rejected by
        # Mosaic: "result/input offset mismatch on non-concat
        # dimension") and contract once against the flattened pair
        # taps — one f32 accumulator write instead of nine
        # read-modify-writes (the 1/K accumulator-traffic hypothesis
        # from the three identical control arms; PERF.md round 3).
        for dr in range(3):
            for dx in range(3):
                k = dr * 3 + dx
                ssh[:, k * 2 * c: (k + 1) * 2 * c] = \
                    sflat[dr * wq + dx: dr * wq + dx + tile_h2 * wq]
        mflat = m_ref[...].reshape(9 * 2 * c, 2 * co)
        acc = jnp.dot(ssh[...], mflat,
                      preferred_element_type=jnp.float32)
    elif control_aligned == "noshift":
        # control arm 2 (WRONG math): no scratch stores at all — the
        # nine dots read aligned value slices of sflat directly,
        # isolating the shift-store traffic from the dot structure
        for dr in range(3):
            patch = sflat[dr * wq: (dr + tile_h2) * wq]
            for dx in range(3):
                acc += jnp.dot(patch, m_ref[dr, dx],
                               preferred_element_type=jnp.float32)
    else:
        if control_aligned:    # control arm 1: same stores, aligned
            for dx in range(3):
                ssh[dx] = sflat[:sh_rows]
        else:
            for dx in range(3):
                ssh[dx] = sflat[dx: dx + sh_rows]
        for dr in range(3):
            for dx in range(3):
                patch = ssh[dx, dr * wq: (dr + tile_h2) * wq]
                acc += jnp.dot(patch, m_ref[dr, dx],
                               preferred_element_type=jnp.float32)
    y = acc * ab_ref[0] + ab_ref[1]
    if relu:
        y = jnp.maximum(y, 0.0)
    r3 = y.reshape(tile_h2, wq, 2 * co).astype(out_ref.dtype)
    out_ref[0, :, :wq] = r3[:, :, :co]     # raw rows 2r
    out_ref[0, :, wq:] = r3[:, :, co:]     # raw rows 2r+1


def _conv3x3_pair_impl(x: jax.Array, w: jax.Array, a, b,
                       interpret: bool = False, tile_h2: int = 0,
                       relu: bool = True, control_aligned: bool = False):
    """Unjitted pair-packed conv3x3(pad 1) + affine(+ReLU).

    x: (N, H, W, C) with H even; w: (3,3,C,Co); a, b: (Co,) channel
    affine (pass a=1, b=conv bias for the raw-conv training forward)."""
    n, h, w_sp, cin = x.shape
    cout = w.shape[-1]
    assert h % 2 == 0, "pair conv requires even H"
    dtype = x.dtype
    h2 = h // 2
    wq = _round_up(w_sp + 2, 8)

    itemsize = 2 if dtype == jnp.bfloat16 else 4
    tile_h2 = tile_h2 or _pick_tile_h2(
        h2, wq, cin, cout, itemsize,
        kstack=(control_aligned == "kstack"))
    n_i = h2 // tile_h2

    # pad: 1 left col (+ right to WQ); one zero packed row (2 raw rows)
    # on top; bottom up to a full extra TH2 block so the +1 halo
    # BlockSpec stays in bounds — packed row H2+1 is the halo pair
    # [x(H)|x(H+1)] = zeros, row H2+2 feeds only the flat +dx overrun of
    # the last tile (cropped columns), the rest is never read.
    xp = jnp.pad(x, ((0, 0), (2, 2 * tile_h2 - 2),
                     (1, wq - 1 - w_sp), (0, 0)))
    x4 = xp.reshape(n, h2 + tile_h2, 2 * wq, cin)  # row pair folded

    m = _build_pair_taps(w.astype(dtype))
    ab = jnp.stack([jnp.tile(a, 2), jnp.tile(b, 2)]).astype(jnp.float32)

    kernel = functools.partial(_pair_kernel, tile_h2=tile_h2, wq=wq,
                               c=cin, co=cout, relu=relu,
                               control_aligned=control_aligned)
    if tile_h2 % 3 == 0:
        # narrow halo: its own 3-row blocks (offset (i+1)*TH2 is a
        # multiple of 3), so the halo stream is 3/TH2 of the input
        th2 = tile_h2
        halo_spec = pl.BlockSpec((1, 3, 2 * wq, cin),
                                 lambda ni, i: (ni, (i + 1) * th2 // 3,
                                                0, 0),
                                 memory_space=pltpu.VMEM)
    else:  # small-shape fallback: the halo is the whole next block
        halo_spec = pl.BlockSpec((1, tile_h2, 2 * wq, cin),
                                 lambda ni, i: (ni, i + 1, 0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n, n_i),
        in_specs=[
            pl.BlockSpec((3, 3, 2 * cin, 2 * cout),
                         lambda ni, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2 * cout), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h2, 2 * wq, cin),
                         lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM),
            halo_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h2, 2 * wq, cout),
            lambda ni, i: (ni, i, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h2, 2 * wq, cout), dtype),
        scratch_shapes=[
            # kstack: the lane-stacked single-dot operand
            pltpu.VMEM((tile_h2 * wq, 9 * 2 * cin)
                       if control_aligned == "kstack"
                       else (3, (tile_h2 + 2) * wq, 2 * cin), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * h2 * wq * 2 * cin * 2 * cout,
            bytes_accessed=(2 * x4.size + m.size) * itemsize
            + n * h * wq * cout * itemsize,
            transcendentals=0),
        interpret=interpret,
    )(m, ab, x4, x4)
    # (N, H2, 2*WQ, Co) is the natural-output row-major order: merging
    # back to (N, H, WQ, Co) is a pure reshape, no relayout
    out = out.reshape(n, h, wq, cout)
    return out[:, :, :w_sp, :]


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_h2", "relu",
                                    "control_aligned"))
def conv3x3_pair_bn_relu(x: jax.Array, w: jax.Array, a: jax.Array,
                         b: jax.Array, interpret: bool = False,
                         tile_h2: int = 0, relu: bool = True,
                         control_aligned: bool = False):
    """Fused pair-packed conv3x3(pad1)+affine(+ReLU). Same contract as
    ops.pallas_conv.conv3x3_bn_relu_pallas; intended for the C<=64
    full-resolution family where lane occupancy, not FLOPs, is the
    limiter."""
    return _conv3x3_pair_impl(x, w, a, b, interpret=interpret,
                              tile_h2=tile_h2, relu=relu,
                              control_aligned=control_aligned)


def conv3x3_pair(x: jax.Array, w: jax.Array, bias: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """Raw conv3x3(pad1) + bias via the pair kernel (no affine/ReLU) —
    the training-forward form."""
    ones = jnp.ones((w.shape[-1],), jnp.float32)
    return _conv3x3_pair_impl(x, w, ones, bias.astype(jnp.float32),
                              interpret=interpret, relu=False)
