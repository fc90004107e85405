"""Resampling ops with the *exact* coordinate conventions the reference uses.

Three different conventions appear in the reference and must not be mixed:

1. ``nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)``
   (models/unet.py:25): src = dst * (H_in - 1) / (H_out - 1).
2. ``cv2.resize`` default bilinear (transforms.py:58): half-pixel convention
   src = (dst + 0.5) * H_in/H_out - 0.5, clamped.
3. ``cv2.resize(..., INTER_NEAREST)`` (transforms.py:59): legacy OpenCV
   nearest, src = floor(dst * H_in/H_out).

TPU-native design: separable bilinear resampling is expressed as two small
dense matmuls (out = A_h @ x @ A_w^T) with interpolation matrices built at
trace time from static shapes. On TPU these ride the MXU and fuse cleanly;
gather-based resampling would go through the VPU with poor locality.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _interp_matrix_align_corners(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, align_corners=True."""
    a = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        a[:, 0] = 1.0
        return a
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 2)
    frac = (src - lo).astype(np.float32)
    a[np.arange(n_out), lo] = 1.0 - frac
    a[np.arange(n_out), lo + 1] += frac
    return a


@lru_cache(maxsize=None)
def _interp_matrix_half_pixel(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear matrix with cv2's half-pixel convention."""
    a = np.zeros((n_out, n_in), np.float32)
    src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = (src - lo).astype(np.float32)
    lo0 = np.clip(lo, 0, n_in - 1)
    lo1 = np.clip(lo + 1, 0, n_in - 1)
    a[np.arange(n_out), lo0] += 1.0 - frac
    a[np.arange(n_out), lo1] += frac
    return a


def _separable_resize(x: jax.Array, a_h: np.ndarray, a_w: np.ndarray) -> jax.Array:
    """Apply (Ho,Hi) and (Wo,Wi) interp matrices along H and W of NHWC x."""
    ah = jnp.asarray(a_h, x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                     else jnp.float32)
    aw = jnp.asarray(a_w, ah.dtype)
    y = x.astype(ah.dtype)
    y = jnp.einsum("oh,nhwc->nowc", ah, y,
                   preferred_element_type=jnp.float32).astype(ah.dtype)
    y = jnp.einsum("pw,nhwc->nhpc", aw, y,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else ah.dtype)


def upsample2x_bilinear_align_corners(x: jax.Array) -> jax.Array:
    """Exact nn.Upsample(scale=2, bilinear, align_corners=True) on NHWC."""
    n, h, w, c = x.shape
    return _separable_resize(
        x,
        _interp_matrix_align_corners(h, 2 * h),
        _interp_matrix_align_corners(w, 2 * w),
    )


def resize_bilinear_cv2(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """cv2.resize default bilinear (half-pixel) on NHWC float input."""
    n, h, w, c = x.shape
    ho, wo = out_hw
    if (h, w) == (ho, wo):
        return x
    return _separable_resize(
        x, _interp_matrix_half_pixel(h, ho), _interp_matrix_half_pixel(w, wo))


def resize_bilinear_cv2_dynamic(x: jax.Array, src_h, src_w,
                                out_hw: Tuple[int, int]) -> jax.Array:
    """cv2 half-pixel bilinear resize whose SOURCE extent is dynamic.

    x: (N, Hb, Wb, C) float — a padded buffer of STATIC bucket shape whose
    top-left (src_h, src_w) region holds the image; src_h/src_w: traced
    int32 scalars. Sampling coordinates never exceed src-1, so the pad
    content is never read and the result equals ``resize_bilinear_cv2`` on
    the unpadded image (oracle-tested vs cv2 in tests/test_resize.py).

    This is the serving shape policy (serving.py): arbitrary request
    sizes round UP to a coarse bucket grid and share ONE compiled program
    per bucket — the jit cache is bounded by the bucket count, not by how
    many distinct image sizes a long-lived server ever sees. Gather+lerp
    instead of the static path's einsum because the interpolation weights
    depend on the traced extent (a dynamic matrix would defeat XLA's
    constant folding and rebuild per call anyway)."""
    ho, wo = out_hw
    f = x.astype(jnp.float32)

    def axis(n_out, src_n):
        src_n = jnp.asarray(src_n, jnp.float32)
        src = ((jnp.arange(n_out, dtype=jnp.float32) + 0.5)
               * (src_n / n_out) - 0.5)
        lo = jnp.floor(src)
        frac = src - lo
        lo0 = jnp.clip(lo, 0, src_n - 1).astype(jnp.int32)
        lo1 = jnp.clip(lo + 1, 0, src_n - 1).astype(jnp.int32)
        return lo0, lo1, frac

    y0, y1, fy = axis(ho, src_h)
    fh = fy[None, :, None, None]
    yv = (jnp.take(f, y0, axis=1) * (1.0 - fh)
          + jnp.take(f, y1, axis=1) * fh)
    x0, x1, fx = axis(wo, src_w)
    fw = fx[None, None, :, None]
    out = (jnp.take(yv, x0, axis=2) * (1.0 - fw)
           + jnp.take(yv, x1, axis=2) * fw)
    return out.astype(x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                      else jnp.float32)


@lru_cache(maxsize=None)
def _nearest_indices_cv2(n_in: int, n_out: int) -> np.ndarray:
    # cv2 INTER_NEAREST: sx = floor(dst * (n_in/n_out)), clamped.
    idx = np.floor(np.arange(n_out) * (n_in / n_out)).astype(np.int32)
    return np.clip(idx, 0, n_in - 1)


def resize_nearest_cv2(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """cv2.resize INTER_NEAREST on NHW[C] arrays (masks: any dtype)."""
    h, w = x.shape[1], x.shape[2]
    ho, wo = out_hw
    if (h, w) == (ho, wo):
        return x
    ys = jnp.asarray(_nearest_indices_cv2(h, ho))
    xs = jnp.asarray(_nearest_indices_cv2(w, wo))
    return x[:, ys][:, :, xs]
