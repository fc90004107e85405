"""Pooling ops, including SegNet's max-pool-with-indices / index-unpooling.

Reference:
- ``nn.MaxPool2d(2, 2)`` (models/unet.py:92),
- ``nn.MaxPool2d(2, return_indices=True)`` (models/segnet.py:79),
- ``nn.MaxUnpool2d(2)`` with saved indices and ``output_size``
  (models/segnet.py:80,104-116).

TPU-native design: PyTorch's unpool is a sparse scatter (bad on TPU). We
invert it into a dense *gather*: every output pixel (y, x) can only have been
selected by the single pooling window (y//2, x//2), so

    out[y, x] = in[y//2, x//2] * (idx[y//2, x//2] == y*W + x)

which is a fully vectorized compare+select over static shapes — no scatter,
no dynamic shapes, VPU-friendly and fusable by XLA. Indices use torch's
convention: flattened over the pre-pool spatial plane (row-major y*W + x),
first-maximum wins ties (jnp.argmax picks the first occurrence, matching
torch's window scan order).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 max pool, NHWC; floors odd spatial dims like torch."""
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, : 2 * h2, : 2 * w2, :]
    # init as a NUMPY scalar of x's dtype: a python int lands as int32
    # (dtype mismatch on int8 inputs), a jnp array breaks reduce_window's
    # VJP ("linearization failed to produce known values")
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = np.asarray(-jnp.inf, x.dtype)[()]
    else:
        init = np.asarray(jnp.iinfo(x.dtype).min, x.dtype)[()]
    return lax.reduce_window(
        x, init, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def max_pool_2x2_with_argmax(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """2x2/stride-2 max pool returning (pooled, flat_indices).

    flat_indices[n, i, j, c] = argmax position in the *input* spatial plane,
    encoded row-major as y*W + x (torch MaxPool2d(return_indices=True)
    convention, models/segnet.py:79).
    """
    pooled, k = max_pool_2x2_argmax_phase(x)
    return pooled, phase_to_flat_index(k, x.shape[2])


def max_pool_2x2_with_phase(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """2x2/stride-2 max pool returning (pooled, phase k in [0,4) int8).

    The phase k = 2*dy + dx identifies which of the window's four pixels
    was selected — the same information as the torch flat index
    (idx = (2i+dy)*W + (2j+dx)) in 1/4 the bytes and without materializing
    iota planes. Selection order matches torch's first-maximum window scan
    (0,0),(0,1),(1,0),(1,1) exactly, built from pairwise strict-greater
    comparisons: W-pairs first within each row (first-in-row wins ties),
    then the row pair (row 0 wins ties) — so e.g. equal maxima at (0,1)
    and (1,0) resolve to (0,1) like torch.

    Measured on chip and REJECTED as SegNet's production pair (b24,
    run_artifacts/probe_pool_phase_b24.jsonl vs the argmax arm): despite
    1/4 the index bytes and no candidate materialization, the four
    strided W/H slices relayout and the pair runs 54.7 vs 35.3 ms
    standalone across SegNet's 5 stages, 81.9 vs 104.3 img/s in the full
    train step — the argmax pair stays (PERF.md round-3). Kept as the
    measured bound and for memory-constrained serving (int8 skips).
    """
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    xe = x[:, : 2 * h2, : 2 * w2, :]
    a = xe[:, 0::2, :, :]          # even rows (n, h2, 2*w2, c)
    b = xe[:, 1::2, :, :]          # odd rows
    a0, a1 = a[:, :, 0::2, :], a[:, :, 1::2, :]
    b0, b1 = b[:, :, 0::2, :], b[:, :, 1::2, :]
    dx0 = a1 > a0                  # within row 0: col 1 only if strictly >
    dx1 = b1 > b0
    row0 = jnp.maximum(a0, a1)
    row1 = jnp.maximum(b0, b1)
    dy = row1 > row0               # row 1 only if strictly >
    pooled = jnp.maximum(row0, row1)
    k = jnp.where(dy, 2 + dx1.astype(jnp.int8), dx0.astype(jnp.int8))
    return pooled, k


def max_pool_2x2_argmax_phase(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """2x2/stride-2 max pool returning (pooled, phase k in [0,4) int8) via
    the argmax-pool's 6D-transpose candidate form.

    Hybrid of the two measured pools: `max_pool_2x2_with_argmax`'s
    candidate transpose (which beat the phase pool's strided W/H slices on
    chip — PERF.md round-3) but WITHOUT the iota expansion to flat int32
    indices — k is stored directly as int8, 1/4 the index bytes and two
    fewer full-plane iota/FMA ops. Pairs with `max_unpool_2x2_from_phase`.
    Tie order is torch's window scan order (argmax first-win), identical
    to both parents.
    """
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    xw = x[:, : 2 * h2, : 2 * w2, :].reshape(n, h2, 2, w2, 2, c)
    # candidates in window scan order (0,0),(0,1),(1,0),(1,1). (A
    # strided-slice variant without the transpose was measured SLOWER for
    # c=64/128 — alternate-64-channel slices break the 128-lane tile —
    # and only marginally faster at c>=256; this form stays. This is the
    # ONE implementation of the candidate form: max_pool_2x2_with_argmax
    # is this + phase_to_flat_index.)
    cand = xw.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2, w2, 4, c)
    k = jnp.argmax(cand, axis=3).astype(jnp.int8)
    pooled = jnp.max(cand, axis=3)
    return pooled, k


def phase_to_flat_index(k: jax.Array, w_in: int) -> jax.Array:
    """Expand a 2-bit phase plane to torch's flat spatial indices."""
    n, h2, w2, c = k.shape
    ki = k.astype(jnp.int32)
    dy, dx = ki // 2, ki % 2
    yy = 2 * jax.lax.broadcasted_iota(jnp.int32, k.shape, 1) + dy
    xx = 2 * jax.lax.broadcasted_iota(jnp.int32, k.shape, 2) + dx
    return yy * w_in + xx


def _assemble_phase_planes(phase, shape, out_hw: Tuple[int, int],
                           dtype) -> jax.Array:
    """Interleave four small-domain phase planes into the unpooled plane.

    ``phase(a, b)`` returns the selected-or-zero values for output phase
    (2i+a, 2j+b), computed in the SMALL (pooled) domain. The four planes
    interleave via two channel-adjacent stacks whose reshapes are
    layout-free (c-minor: (j, q, c) -> (2j+q, c)) — no big-domain int32
    repeat, no 6D transpose (measured 2.2x faster than the repeat-compare
    form, 22.2 -> 10.0 ms at b24 360x480x64; PERF.md round-3). Odd output
    rows/cols the pool never covered stay zero (torch ``output_size``
    semantics, reference models/segnet.py:104).
    """
    n, h2, w2, c = shape
    ho, wo = out_hw

    def interleave_w(p0, p1):  # (n,h2,w2,c) x2 -> (n,h2,2*w2,c)
        return jnp.stack([p0, p1], axis=3).reshape(n, h2, 2 * w2, c)

    row0 = interleave_w(phase(0, 0), phase(0, 1))
    row1 = interleave_w(phase(1, 0), phase(1, 1))
    t = jnp.stack([row0, row1], axis=2).reshape(n, 2 * h2, 2 * w2, c)
    pad_h, pad_w = max(ho - 2 * h2, 0), max(wo - 2 * w2, 0)
    if pad_h or pad_w:
        t = jnp.pad(t, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return t[:, :ho, :wo, :]


def max_unpool_2x2_from_phase(x: jax.Array, k: jax.Array,
                              out_hw: Tuple[int, int]) -> jax.Array:
    """Invert max_pool_2x2_with_phase: phase-mask unpool without flat
    indices — each output phase (a, b) keeps x where k == 2a+b."""
    zero = jnp.zeros((), x.dtype)

    def phase(a, b):
        return jnp.where(k == 2 * a + b, x, zero)

    return _assemble_phase_planes(phase, x.shape, out_hw, x.dtype)


def max_unpool_2x2(x: jax.Array, idx: jax.Array,
                   out_hw: Tuple[int, int]) -> jax.Array:
    """Invert max_pool_2x2_with_argmax: place x at idx in a (Ho, Wo) plane.

    Phase-mask formulation: the selected-or-zero value for each of the
    four output phases (a, b) is computed in the SMALL (pooled) domain —
    idx can only select output pixel (2i+a, 2j+b) from window (i, j) —
    then ``_assemble_phase_planes`` interleaves the planes with layout-free
    reshapes. This replaced the earlier iota-indexed double gather, which
    lowered to a per-element gather op running at 5-10% of the HBM
    bandwidth bound on chip — 26.5 ms for the stage-1 pool+unpool pair vs
    2.3 ms bound at b24 360x480x64 (run_artifacts/probe_pool_b24.jsonl,
    the explanation for SegNet's MFU gap, VERDICT r2 weak #4). Handles odd
    Ho/Wo (torch's ``output_size`` semantics, models/segnet.py:104): the
    trailing row/col's index can never be selected, so it stays zero like
    torch's.
    """
    h2, w2 = x.shape[1], x.shape[2]
    ho, wo = out_hw
    ii = jax.lax.broadcasted_iota(jnp.int32, (h2, w2), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (h2, w2), 1)
    zero = jnp.zeros((), x.dtype)

    def phase(a, b):
        m = idx == ((2 * ii + a) * wo + (2 * jj + b))[None, :, :, None]
        return jnp.where(m, x, zero)

    return _assemble_phase_planes(phase, x.shape, out_hw, x.dtype)
