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
from jax import lax


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 max pool, NHWC; floors odd spatial dims like torch."""
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, : 2 * h2, : 2 * w2, :]
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else
        jnp.iinfo(x.dtype).min,
        lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def max_pool_2x2_with_argmax(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """2x2/stride-2 max pool returning (pooled, flat_indices).

    flat_indices[n, i, j, c] = argmax position in the *input* spatial plane,
    encoded row-major as y*W + x (torch MaxPool2d(return_indices=True)
    convention, models/segnet.py:79).
    """
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    xw = x[:, : 2 * h2, : 2 * w2, :].reshape(n, h2, 2, w2, 2, c)
    # candidates in window scan order (0,0),(0,1),(1,0),(1,1)
    cand = xw.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2, w2, 4, c)
    k = jnp.argmax(cand, axis=3)  # (n, h2, w2, c) in [0,4)
    pooled = jnp.max(cand, axis=3)
    dy, dx = k // 2, k % 2
    yy = 2 * jax.lax.broadcasted_iota(jnp.int32, (n, h2, w2, c), 1) + dy
    xx = 2 * jax.lax.broadcasted_iota(jnp.int32, (n, h2, w2, c), 2) + dx
    idx = (yy * w + xx).astype(jnp.int32)
    return pooled, idx


def max_unpool_2x2(x: jax.Array, idx: jax.Array,
                   out_hw: Tuple[int, int]) -> jax.Array:
    """Invert max_pool_2x2_with_argmax: place x at idx in a (Ho, Wo) plane.

    Dense gather formulation (see module docstring). Handles odd Ho/Wo
    (torch's ``output_size`` semantics, models/segnet.py:104): trailing
    rows/cols the pool never covered stay zero.
    """
    n, h2, w2, c = x.shape
    ho, wo = out_hw
    # Source window for each output pixel; clamp for odd trailing row/col.
    ys = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (ho,), 0) // 2, h2 - 1)
    xs = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (wo,), 0) // 2, w2 - 1)
    vals = x[:, ys, :, :][:, :, xs, :]              # (n, ho, wo, c)
    sel_idx = idx[:, ys, :, :][:, :, xs, :]          # (n, ho, wo, c)
    yy = jax.lax.broadcasted_iota(jnp.int32, (ho, wo), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (ho, wo), 1)
    flat = (yy * wo + xx)[None, :, :, None]
    return jnp.where(sel_idx == flat, vals, jnp.zeros((), x.dtype))
