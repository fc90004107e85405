"""Alternative conv3x3 formulations for MXU-underfilled (shallow) shapes.

PERF.md's per-shape table shows the full-resolution shallow layers of
UNet/SegNet (Cin/Cout of 3/64/128 at 360x480) running at 5-42% of peak
while the deep shapes sit at 91-102% of roofline: with NHWC stride-1
convs the MXU contraction (K) dimension is Cin and the output (N)
dimension is Cout, so 64-channel layers use half a lane-tile and the
3-channel stem almost none. These reformulations trade a controlled FLOP
increase for full lane utilization (VERDICT r2 next-step #3; the
capability being replaced is cuDNN's conv for the reference models,
/root/reference/models/unet.py:5-17):

- ``s2d_conv3x3``: space-to-depth by 2x2 -> the conv becomes TWO
  2x3-block convs (one per output row phase) with K = 6*4*Cin and
  N = 2*Cout, i.e. 64-channel layers contract over 1536 lanes and emit
  128 — at 12/9 = 1.33x the MACs. Bit-math-equal to the direct conv
  (same dot products, different grouping).
- ``im2col_conv3x3``: patch-extract to (..., 9*Cin) then one matmul —
  K = 27 for the 3-channel stem instead of 3-per-tap.

Both are pure jittable functions, oracle-tested against
lax.conv_general_dilated (tests/test_conv_alt.py); tools/shallow_conv.py
measures them on chip against the direct conv.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def space_to_depth2(x: jax.Array) -> jax.Array:
    """(N,H,W,C) -> (N,H/2,W/2,4C); channel block (a*2+b)*C+c holds input
    pixel (2i+a, 2j+b, c). H and W must be even."""
    n, h, w, c = x.shape
    z = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return z.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def _s2d_kernels(w: jax.Array):
    """Build the two (2, 3, 4*Cin, 2*Cout) block kernels (p = output row
    phase) from a (3, 3, Cin, Cout) kernel. Pure gather/scatter on the
    weight — differentiable, traced once per jit."""
    cin, cout = w.shape[2], w.shape[3]
    kernels = []
    for p in (0, 1):
        k = jnp.zeros((2, 3, 4 * cin, 2 * cout), w.dtype)
        for dy in range(3):
            r = p + dy - 1          # input row offset from 2i
            br, a = r // 2, r % 2   # block-row offset, intra-block row
            abase = (br + 1) if p == 0 else br  # window alignment
            for dx in range(3):
                for q in (0, 1):    # output col phase, packed in channels
                    s = q + dx - 1
                    bc, b = s // 2, s % 2
                    k = k.at[abase, bc + 1,
                             (a * 2 + b) * cin:(a * 2 + b + 1) * cin,
                             q * cout:(q + 1) * cout].add(w[dy, dx])
        kernels.append(k)
    return kernels


def s2d_conv3x3(x: jax.Array, w: jax.Array,
                preferred_element_type=jnp.float32) -> jax.Array:
    """SAME stride-1 3x3 conv via space-to-depth: numerically the same dot
    products as lax.conv, grouped to fill the MXU for shallow channels."""
    n, h, w_, cin = x.shape
    cout = w.shape[3]
    assert h % 2 == 0 and w_ % 2 == 0, (h, w_)
    z = space_to_depth2(x)
    k0, k1 = _s2d_kernels(w)
    outs = []
    for p, k in ((0, k0), (1, k1)):
        pad_rows = (1, 0) if p == 0 else (0, 1)
        o = jax.lax.conv_general_dilated(
            z, k, (1, 1), [pad_rows, (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred_element_type)
        outs.append(o)  # (N, H/2, W/2, 2*Cout): [q=0 | q=1]
    # interleave: y[n, 2i+p, 2j+q, o] = outs[p][n, i, j, q*cout+o]
    y = jnp.stack(outs, axis=2)          # (N, H/2, p, W/2, 2*Cout)
    y = y.reshape(n, h // 2, 2, w_ // 2, 2, cout)  # (n,i,p,j,q,o)
    return y.reshape(n, h, w_, cout)


def wgroup_conv3x3(x: jax.Array, w: jax.Array, g: int = 2,
                   preferred_element_type=jnp.float32) -> jax.Array:
    """SAME stride-1 3x3 conv computing ``g`` adjacent output COLUMNS per
    matmul: a (3, g+2, Cin, g*Cout) kernel at W-stride g.

    Rationale (measured, run_artifacts/shallow_conv_b24.jsonl): Cout=64
    layers run at ~45 TF/s while the same-K Cout=128 shape hits ~88 —
    the MXU's output tile is half-empty at 64 channels. Column grouping
    multiplies the output-channel dimension to g*Cout with NO input
    transform, and the output (N,H,W/g,g*Cout) -> (N,H,W,Cout) reshape is
    a free bitcast (channel-minor layouts coincide). Cost: (g+2)/3 the
    MACs of the 9-tap conv (g=2 -> 1.33x, g=4 -> 2x); measured 1.76x
    end-to-end on the 3->64 stem at g=2. W must divide by g.

    Derivation: output col g*j'+q (q in [0,g)) needs input cols
    g*j'+q-1 .. g*j'+q+1; with left pad 1 and a width-(g+2) window at
    stride g, tap dx' reads input col g*j'-1+dx', so
    w2[dy, q+dx, c, q*Cout+o] = w[dy, dx, c, o].
    """
    n, h, w_, cin = x.shape
    cout = w.shape[3]
    assert w_ % g == 0, (w_, g)
    w2 = jnp.zeros((3, g + 2, cin, g * cout), w.dtype)
    for q in range(g):
        w2 = w2.at[:, q:q + 3, :, q * cout:(q + 1) * cout].add(w)
    y = jax.lax.conv_general_dilated(
        x, w2, (1, g), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type)
    return y.reshape(n, h, w_, cout)


def wpair_conv3x3(x: jax.Array, w: jax.Array,
                  preferred_element_type=jnp.float32) -> jax.Array:
    """wgroup_conv3x3 with g=2 (two output columns per matmul)."""
    return wgroup_conv3x3(x, w, 2, preferred_element_type)


def im2col_conv3x3(x: jax.Array, w: jax.Array,
                   preferred_element_type=jnp.float32) -> jax.Array:
    """SAME stride-1 3x3 conv as patch-extraction + one matmul: K becomes
    9*Cin (27 for the RGB stem) instead of Cin per tap."""
    n, h, w_, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + w_, :]
            for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)            # (N,H,W,9*Cin)
    wm = w.transpose(0, 1, 2, 3).reshape(9 * cin, -1)   # (9*Cin, Cout)
    return jax.lax.dot_general(
        patches, wm, (((3,), (0,)), ((), ())),
        preferred_element_type=preferred_element_type)


def _np_reference_conv(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Tiny numpy oracle for the tests."""
    n, h, ww, cin = x.shape
    cout = w.shape[3]
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = np.zeros((n, h, ww, cout), np.float32)
    for dy in range(3):
        for dx in range(3):
            y += xp[:, dy:dy + h, dx:dx + ww, :] @ w[dy, dx]
    return y
