"""On-device, batched, jittable paired image+mask augmentation.

Reference: transforms.py — per-sample Python/OpenCV ops executed by 4
DataLoader worker processes (train.py:80-84); benchmark.py measures this as
the input bottleneck (SURVEY.md §3.1 hot loop #1).

TPU-native redesign: every op is a pure function of (PRNG key, batched uint8
NHWC images, batched uint8/int NHW masks) with **static shapes**, composed
and jit-fused into the train step — augmentation runs on the VPU/MXU between
the batch gather and the forward pass, so the host does no per-sample work
at all.

Semantics parity with transforms.py (quirks documented in SURVEY.md §2.5):
- probabilities: HorizontalFlip/GaussianBlur apply when u < p
  (transforms.py:183,215); RandomRotation/ColorJitter *skip* when u < p
  (transforms.py:149,470) — the inverted reference semantics are kept so the
  training recipe reproduces; pass fixed semantics via apply_p directly.
- Rotation: cv2.warpAffine about the image center, bilinear+border-0 for the
  image, NEAREST + constant ignore-fill for the mask (transforms.py:152-162).
- RandomScale: uniform scale in [0.5, 2.0), resize both, center-pad to at
  least the original size (img 0 / mask fill), random crop back
  (transforms.py:85-127). Implemented as a single inverse affine resample —
  scale about a random anchor — to keep shapes static.
- GaussianBlur: sigma ~ U(0, 3), odd ksize = int(max(3.3*sigma, 3)) like the
  imgaug rule (transforms.py:224-238), cv2 BORDER_REFLECT_101 edges,
  separable depthwise convolution with a masked 9-tap kernel.
- ColorJitter: brightness/contrast via the reference's integer LUT formulas
  (transforms.py:296-303,337-344), saturation as PIL's gray-blend, hue
  through PIL's uint8-quantized HSV space (exact HSV->RGB leg,
  oracle-bounded RGB->HSV — see _adjust_hue). Reference recipe
  ColorJitter(0.4, 0.4) = p 0.4 (skip), brightness only (train.py:66).
- Normalize: /255 then (x - MEAN)/STD per BGR channel (transforms.py:485-539).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- affine --

def _affine_sample_bilinear(img: jax.Array, inv: jax.Array) -> jax.Array:
    """Sample one image (H,W,C float32) at inverse-mapped coords.

    inv: (2,3) inverse affine; dst (x,y) -> src = inv @ (x, y, 1).
    Border: constant 0 (cv2.warpAffine default).
    """
    h, w, c = img.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2]
    sy = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2]
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx = sx - x0; fy = sy - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb[..., None], v, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    fx = fx[..., None]; fy = fy[..., None]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _affine_sample_bilinear_clamp(img: jax.Array, inv: jax.Array
                                  ) -> jax.Array:
    """Like _affine_sample_bilinear but with edge-clamped taps —
    cv2.resize's border behavior (vs warpAffine's constant-0)."""
    h, w, c = img.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2]
    sy = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2]
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]; fy = (sy - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    v00 = img[y0i, x0i]; v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]; v11 = img[y1i, x1i]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _affine_sample_nearest(mask: jax.Array, inv: jax.Array,
                           fill: int) -> jax.Array:
    """Nearest-neighbor inverse-affine sample of one (H,W) int mask with
    constant fill outside (cv2 INTER_NEAREST rounds via floor(x+0.5))."""
    h, w = mask.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2]
    sy = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2]
    xi = jnp.floor(sx + 0.5).astype(jnp.int32)
    yi = jnp.floor(sy + 0.5).astype(jnp.int32)
    inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    v = mask[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    return jnp.where(inb, v, jnp.asarray(fill, mask.dtype))


def _rotation_inverse(angle_deg: jax.Array, h: int, w: int) -> jax.Array:
    """Inverse of cv2.getRotationMatrix2D(center=(w/2, h/2), angle, 1.0).

    cv2's forward map rotates by +angle (counter-clockwise with y down);
    the inverse map is the rotation by the same angle applied to dst coords
    (R^-1 = R(-a); getRotationMatrix2D uses alpha=cos, beta=sin with
    x' = alpha*x + beta*y + ..., so the inverse swaps the sign of beta).
    """
    a = angle_deg * (jnp.pi / 180.0)
    cx, cy = w / 2.0, h / 2.0  # matches tuple(np.array(shape[1::-1])/2)
    cos, sin = jnp.cos(a), jnp.sin(a)
    # forward: [cos, sin, (1-cos)cx - sin*cy; -sin, cos, sin*cx + (1-cos)cy]
    # inverse: replace sin by -sin
    return jnp.stack([
        jnp.stack([cos, -sin, (1 - cos) * cx + sin * cy]),
        jnp.stack([sin, cos, -sin * cx + (1 - cos) * cy]),
    ])


def random_rotation(key: jax.Array, images: jax.Array, masks: jax.Array,
                    p: float = 0.5, angle: float = 10.0, fill: int = 0,
                    reference_semantics: bool = True):
    """transforms.py:129-164. With reference_semantics=True the transform is
    SKIPPED when u < p (the inverted reference behavior; train.py:63 passes
    p=15 so rotation never fires — reproduced faithfully when configured
    that way)."""
    n, h, w, _ = images.shape
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (n,))
    apply = (u >= p) if reference_semantics else (u < p)
    angles = jax.random.uniform(k2, (n,), minval=-angle, maxval=angle)
    angles = jnp.where(apply, angles, 0.0)

    def one(img, msk, ang):
        inv = _rotation_inverse(ang, h, w)
        return (_affine_sample_bilinear(img, inv),
                _affine_sample_nearest(msk, inv, fill))

    imgs, msks = jax.vmap(one)(images.astype(jnp.float32), masks, angles)
    return imgs, msks


def random_scale_crop(key: jax.Array, images: jax.Array, masks: jax.Array,
                      scale: Tuple[float, float] = (0.5, 2.0),
                      fill: int = 0):
    """transforms.py:63-127 (RandomScale): scale, pad back to original size
    (img 0 / mask fill), random crop. Expressed as one inverse affine with a
    random translation so output shape stays static.

    For s >= 1: crop offset in [0, (s-1)*dim]; for s < 1 the scaled image is
    centered with pad (offset -(dim - s*dim)//2) and the residual crop range
    is 0 — both cases reduce to src = (dst + off) / s with
    off in [lo, hi] where lo = min(0, -(dim - s*dim)//2)... see tests for the
    equivalence check against a numpy oracle of the reference algorithm.
    """
    n, h, w, _ = images.shape
    ks, ko = jax.random.split(key)
    s = jax.random.uniform(ks, (n,), minval=scale[0], maxval=scale[1])
    # crop offsets (for s > 1) as uniforms in [0, 1); scaled inside the core
    u1, u2 = jax.random.split(ko)
    uy = jax.random.uniform(u1, (n,))
    ux = jax.random.uniform(u2, (n,))
    return scale_pad_crop(images, masks, s, uy, ux, fill)


def scale_pad_crop(images: jax.Array, masks: jax.Array, s: jax.Array,
                   uy: jax.Array, ux: jax.Array, fill: int = 0):
    """Deterministic core of RandomScale (transforms.py:85-127): per-sample
    scale factor ``s`` and crop-offset fractions ``uy``/``ux`` in [0, 1)
    (mapped to randint(0, pad) like the reference's random.randint)."""
    n, h, w, _ = images.shape
    # scaled size (cv2 rounds: int(round(dim*s)))
    sh = jnp.round(h * s); sw = jnp.round(w * s)
    # pad amounts (centered) when smaller
    pad_top = jnp.maximum(0.0, jnp.floor((h - sh) / 2.0))
    pad_left = jnp.maximum(0.0, jnp.floor((w - sw) / 2.0))
    # crop offsets when larger: uniform int in [0, padded - orig]
    max_y = jnp.maximum(sh, h) - h
    max_x = jnp.maximum(sw, w) - w
    off_y = jnp.floor(uy * (max_y + 1))
    off_x = jnp.floor(ux * (max_x + 1))

    # dst (x,y) -> src = (x + off_x - pad_left) / s
    def one(img, msk, si, oy, ox, pt, pl, shi, swi):
        # cv2.resize called with fx=fy=s (transforms.py:90) uses 1/s as the
        # coordinate scale — NOT w/round(w*s)
        fx = 1.0 / si
        fy = 1.0 / si
        # half-pixel bilinear: src = (dst + 0.5) * f - 0.5, dst in scaled img
        inv = jnp.stack([
            jnp.stack([fx, 0.0, (ox - pl + 0.5) * fx - 0.5]),
            jnp.stack([0.0, fy, (oy - pt + 0.5) * fy - 0.5]),
        ])
        # cv2.resize clamps edge taps (unlike warpAffine's zero border)
        im = _affine_sample_bilinear_clamp(img, inv)
        # nearest for mask: cv2 INTER_NEAREST uses floor(dst * f)
        inv_n = jnp.stack([
            jnp.stack([fx, 0.0, (ox - pl) * fx]),
            jnp.stack([0.0, fy, (oy - pt) * fy]),
        ])
        h_, w_ = msk.shape
        yy = jax.lax.broadcasted_iota(jnp.float32, (h_, w_), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (h_, w_), 1)
        # +eps: when x/s is an exact integer, float64 (cv2) lands just above
        # it while float32 can land just below and floor one pixel off
        eps = 1e-4
        sx = jnp.floor(inv_n[0, 0] * xx + inv_n[0, 2] + eps).astype(
            jnp.int32)
        sy = jnp.floor(inv_n[1, 1] * yy + inv_n[1, 2] + eps).astype(
            jnp.int32)
        inb = (sy >= 0) & (sy < h_) & (sx >= 0) & (sx < w_) & \
              (yy + oy - pt >= 0) & (yy + oy - pt < shi) & \
              (xx + ox - pl >= 0) & (xx + ox - pl < swi)
        m = msk[jnp.clip(sy, 0, h_ - 1), jnp.clip(sx, 0, w_ - 1)]
        m = jnp.where(inb, m, jnp.asarray(fill, msk.dtype))
        # image: zero outside the scaled region (pad value [0,0,0])
        imb = ((yy + oy - pt >= 0) & (yy + oy - pt < shi) &
               (xx + ox - pl >= 0) & (xx + ox - pl < swi))
        im = jnp.where(imb[..., None], im, 0.0)
        return im, m

    imgs, msks = jax.vmap(one)(images.astype(jnp.float32), masks, s, off_y,
                               off_x, pad_top, pad_left, sh, sw)
    return imgs, msks


# ----------------------------------------------------------------- flips --

def random_hflip(key: jax.Array, images: jax.Array, masks: jax.Array,
                 p: float = 0.5):
    """transforms.py:166-187 — per-sample horizontal flip with prob p."""
    n = images.shape[0]
    flip = jax.random.uniform(key, (n,)) < p
    imgs = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)
    msks = jnp.where(flip[:, None, None], masks[:, :, ::-1], masks)
    return imgs, msks


# ------------------------------------------------------------------ blur --

_BLUR_TAPS = 9  # max ksize for sigma<3: int(3.3*sigma)|odd <= 9


def _gaussian_kernel_1d(sigma: jax.Array, ksize: jax.Array) -> jax.Array:
    """cv2.getGaussianKernel for given sigma, masked to odd ksize <= 9 taps,
    centered in a fixed 9-tap window."""
    r = _BLUR_TAPS // 2
    pos = jnp.arange(-r, r + 1, dtype=jnp.float32)
    active = jnp.abs(pos) <= (ksize - 1) / 2
    g = jnp.exp(-0.5 * jnp.square(pos) / jnp.maximum(sigma, 1e-6) ** 2)
    g = jnp.where(active, g, 0.0)
    return g / jnp.sum(g)


def _blur_ksize_from_sigma(sigma: jax.Array) -> jax.Array:
    """imgaug ksize rule (transforms.py:224-238) for sigma < 3."""
    k = jnp.maximum(jnp.floor(3.3 * sigma), 3.0)
    k = jnp.where(k % 2 == 0, k + 1, k)
    return k


def random_gaussian_blur(key: jax.Array, images: jax.Array,
                         masks: jax.Array, p: float = 0.5,
                         sigma: Tuple[float, float] = (0.0, 3.0)):
    """transforms.py:189-238. Image only; separable depthwise conv with
    reflect-101 edges (cv2 BORDER_DEFAULT). The static tap window supports
    ksize <= 9, i.e. sigma < 3 (the reference's range)."""
    if int(max(3.3 * sigma[1], 3)) | 1 > _BLUR_TAPS + 1:
        raise ValueError(
            f"sigma up to {sigma[1]} needs ksize "
            f"{int(max(3.3 * sigma[1], 3)) | 1} > the static "
            f"{_BLUR_TAPS}-tap window; raise _BLUR_TAPS for wider blurs")
    n, h, w, c = images.shape
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1, (n,)) < p
    sig = jax.random.uniform(k2, (n,), minval=sigma[0], maxval=sigma[1])
    ksz = _blur_ksize_from_sigma(sig)
    kern = jax.vmap(_gaussian_kernel_1d)(sig, ksz)  # (n, 9)
    ident = jnp.zeros((_BLUR_TAPS,)).at[_BLUR_TAPS // 2].set(1.0)
    kern = jnp.where(apply[:, None], kern, ident)

    x = images.astype(jnp.float32)
    r = _BLUR_TAPS // 2
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0), (0, 0)), mode="reflect")
    # vertical pass: sum_t kern[n,t] * xp[n, y+t, x, c]
    y = jnp.zeros_like(x)
    for t in range(_BLUR_TAPS):
        y = y + kern[:, t, None, None, None] * xp[:, t:t + h, :, :]
    yp = jnp.pad(y, ((0, 0), (0, 0), (r, r), (0, 0)), mode="reflect")
    z = jnp.zeros_like(x)
    for t in range(_BLUR_TAPS):
        z = z + kern[:, t, None, None, None] * yp[:, :, t:t + w, :]
    # cv2.GaussianBlur on a uint8 image rounds back to uint8
    # (saturate_cast); downstream ColorJitter LUTs assume integer inputs
    z = jnp.round(jnp.clip(z, 0, 255))
    return z, masks


# ----------------------------------------------------------------- color --

def _quantize_factor(f: jax.Array) -> jax.Array:
    """Quantize a jitter factor to a multiple of 2^-12.

    The reference truncates float64 LUT products (transforms.py:296-303,
    337-344), which float32 cannot reproduce at integer boundaries. With the
    factor on a 2^-12 grid, every product i*f (i < 256) is *exact* in
    float32, so truncation has exact semantics. The factor distribution
    changes by < 2.5e-4 — immaterial against U(lo, hi) jitter draws.
    """
    return jnp.round(f * 4096.0) / 4096.0


def _adjust_brightness(img: jax.Array, factor: jax.Array) -> jax.Array:
    """uint8 LUT i*factor clipped then truncated (transforms.py:296-303)."""
    v = img * _quantize_factor(factor)[:, None, None, None]
    return jnp.floor(jnp.clip(v, 0, 255))


def _adjust_contrast(img: jax.Array, factor: jax.Array) -> jax.Array:
    """LUT (i-74)*factor + 74, clip, truncate toward zero
    (transforms.py:337-344; astype('uint8') truncates)."""
    f = _quantize_factor(factor)[:, None, None, None]
    v = (img - 74.0) * f + 74.0
    return jnp.trunc(jnp.clip(v, 0, 255))


def _adjust_saturation(img_bgr: jax.Array, factor: jax.Array) -> jax.Array:
    """PIL ImageEnhance.Color: blend toward 'L' grayscale
    (transforms.py:305-321). The reference hands PIL a BGR ndarray, so PIL's
    luma coefficients apply to the channels in ARRAY order (channel 0 gets
    the 0.299 weight even though it holds blue) — reproduced faithfully.
    PIL's L24 conversion is (19595*c0 + 38470*c1 + 7471*c2 + 0x8000) >> 16.
    """
    c0, c1, c2 = img_bgr[..., 0], img_bgr[..., 1], img_bgr[..., 2]
    gray = jnp.floor((19595.0 * c0 + 38470.0 * c1 + 7471.0 * c2 + 32768.0)
                     / 65536.0)
    f = factor[:, None, None, None]
    out = gray[..., None] + (img_bgr - gray[..., None]) * f
    return jnp.round(jnp.clip(out, 0, 255))


def _adjust_hue(img_bgr: jax.Array, factor: jax.Array) -> jax.Array:
    """PIL uint8-quantized HSV hue shift (transforms.py:240-282).

    The reference wraps the ndarray in PIL, converts to the quantized
    uint8 'HSV' mode, adds ``uint8(hue_factor * 255)`` to H with uint8
    wraparound, and converts back — operating on the array's CHANNEL ORDER
    as if it were RGB even though it holds BGR (same quirk as saturation).
    Reproduced here at uint8 granularity in float32 (TPU has no float64):
    the HSV->RGB leg is bit-exact vs PIL (tested exhaustively on sweeps +
    random triples); the RGB->HSV hue can differ by +-1 uint8 hue unit on
    ~0.8% of pixels where PIL's C double rounding crosses an integer
    boundary — the final image is oracle-bounded in tests
    (tests/test_augment.py::test_adjust_hue_vs_pil)."""
    c0, c1, c2 = img_bgr[..., 0], img_bgr[..., 1], img_bgr[..., 2]
    mx = jnp.maximum(c0, jnp.maximum(c1, c2))
    mn = jnp.minimum(c0, jnp.minimum(c1, c2))
    cr = mx - mn
    safe = jnp.where(cr > 0, cr, 1.0)
    rc = (mx - c0) / safe
    gc = (mx - c1) / safe
    bc = (mx - c2) / safe
    h = jnp.where(mx == c0, bc - gc,
                  jnp.where(mx == c1, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.mod(h / 6.0 + 1.0, 1.0)
    uh = jnp.where(cr > 0, jnp.floor(h * 255.0), 0.0)
    us = jnp.where(cr > 0,
                   jnp.floor(cr / jnp.where(mx > 0, mx, 1.0) * 255.0), 0.0)
    uv = mx

    # np.uint8(hue_factor*255): trunc toward zero then wrap mod 256
    shift = jnp.mod(jnp.trunc(factor * 255.0), 256.0)
    uh = jnp.mod(uh + shift[:, None, None], 256.0)

    # PIL hsv2rgb: h*6/255, floor/frac, p/q/t ROUNDED to nearest (bit-exact
    # vs PIL's C implementation)
    h6 = uh * jnp.float32(6.0 / 255.0)
    i = jnp.floor(h6)
    f = h6 - i
    sf = us * jnp.float32(1.0 / 255.0)
    p = jnp.round(uv * (1 - sf))
    q = jnp.round(uv * (1 - sf * f))
    t = jnp.round(uv * (1 - sf * (1 - f)))
    vv = jnp.round(uv)
    i = i.astype(jnp.int32) % 6
    o0 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [vv, q, p, p, t, vv])
    o1 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [t, vv, vv, q, p, p])
    o2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [p, p, t, vv, vv, q])
    out = jnp.stack([o0, o1, o2], axis=-1)
    # s == 0 (grayscale) short-circuits to v in PIL
    return jnp.where((us == 0)[..., None], uv[..., None], out)


def color_jitter(key: jax.Array, images: jax.Array, masks: jax.Array,
                 p: float = 0.5, brightness: float = 0.0,
                 contrast: float = 0.0, saturation: float = 0.0,
                 hue: float = 0.0, reference_semantics: bool = True,
                 random_order: bool = True):
    """transforms.py:364-483. Reference semantics: SKIP when u < p
    (transforms.py:470-471). Factor ranges follow _check_input: brightness/
    contrast/saturation in [max(0,1-v), 1+v], hue in [-v, v].

    Like the reference (transforms.py:430-460 random.shuffle of the active
    sub-transforms per sample), the application ORDER is randomized per
    sample when ``random_order=True``: every permutation of the active ops
    is computed as a static branch and each sample selects one — shapes stay
    static for XLA, and with k active ops the extra cost is k!-1 elementwise
    passes (the reference recipe has only brightness active, so zero extra).
    ``random_order=False`` applies brightness->contrast->saturation->hue.
    """
    import itertools
    n = images.shape[0]
    k0, kb, kc, ks, kh, kp = jax.random.split(key, 6)
    u = jax.random.uniform(k0, (n,))
    apply = (u >= p) if reference_semantics else (u < p)
    x0 = images.astype(jnp.float32)

    def factor(k, v):
        lo, hi = max(0.0, 1.0 - v), 1.0 + v
        f = jax.random.uniform(k, (n,), minval=lo, maxval=hi)
        return jnp.where(apply, f, 1.0)

    ops = []
    if brightness:
        fb = factor(kb, brightness)
        ops.append(lambda x: _adjust_brightness(x, fb))
    if contrast:
        fc = factor(kc, contrast)
        ops.append(lambda x: _adjust_contrast(x, fc))
    if saturation:
        fs = factor(ks, saturation)
        ops.append(lambda x: _adjust_saturation(x, fs))
    if hue:
        fh = jax.random.uniform(kh, (n,), minval=-hue, maxval=hue)
        fh = jnp.where(apply, fh, 0.0)
        ops.append(lambda x: _adjust_hue(x, fh))

    if not ops:
        return x0, masks
    if len(ops) == 1 or not random_order:
        x = x0
        for op in ops:
            x = op(x)
        return x, masks

    perms = list(itertools.permutations(range(len(ops))))
    pidx = jax.random.randint(kp, (n,), 0, len(perms))
    outs = []
    for perm in perms:
        x = x0
        for j in perm:
            x = ops[j](x)
        outs.append(x)
    stacked = jnp.stack(outs)  # (k!, N, H, W, C)
    x = jnp.take_along_axis(
        stacked, pidx[None, :, None, None, None], axis=0)[0]
    return x, masks


# ------------------------------------------------------------- normalize --

def to_tensor_normalize(images: jax.Array, mean: Sequence[float],
                        std: Sequence[float],
                        dtype=jnp.float32) -> jax.Array:
    """transforms.py:485-539: /255 then per-channel (x-mean)/std. Stays NHWC
    (the reference transposes to CHW for torch; NHWC is TPU-native)."""
    m = jnp.asarray(mean, jnp.float32) * 255.0
    s = jnp.asarray(std, jnp.float32) * 255.0
    return ((images.astype(jnp.float32) - m) / s).astype(dtype)


# ------------------------------------------------------------- pipelines --

class AugmentConfig(NamedTuple):
    """The reference training pipeline (train.py:61-69) knobs."""
    rotation_p: float = 15.0       # train.py:63 binds p=15 -> never rotates
    rotation_angle: float = 10.0
    rotation_fill: int = 11        # ignore_index
    blur_p: float = 0.5
    hflip_p: float = 0.5
    jitter_p: float = 0.4          # ColorJitter(0.4, 0.4) -> p=.4, b=.4
    jitter_brightness: float = 0.4
    jitter_contrast: float = 0.0
    jitter_saturation: float = 0.0
    jitter_hue: float = 0.0
    jitter_random_order: bool = True  # transforms.py:430-460 shuffle
    random_scale: bool = False     # lr_finder.py pipeline uses it
    scale_range: Tuple[float, float] = (0.5, 2.0)
    scale_fill: int = 11
    mean: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    std: Tuple[float, float, float] = (1.0, 1.0, 1.0)


def make_train_augment(cfg: AugmentConfig, compute_dtype=jnp.float32):
    """Build augment_fn(key, images_u8, masks_u8) -> (images, masks) matching
    the reference train pipeline order: Rotation -> Blur -> HFlip ->
    ColorJitter -> ToTensor -> Normalize (train.py:61-69; Resize happens at
    cache build)."""

    def fn(key, images, masks):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        x = images
        m = masks
        # reference semantics skip rotation when u < p, so p >= 1 means the
        # warp NEVER fires (train.py:63 binds p=15, SURVEY.md §2.5.1) —
        # compile it away instead of warping by angle 0 (full-res gathers
        # are expensive on TPU). Order: Rotation precedes RandomScale in
        # the only reference pipeline using both (lr_finder.py:144-153).
        if cfg.rotation_angle and cfg.rotation_p < 1.0:
            x, m = random_rotation(k1, x, m, cfg.rotation_p,
                                   cfg.rotation_angle, cfg.rotation_fill)
        if cfg.random_scale:
            x, m = random_scale_crop(k5, x, m, cfg.scale_range,
                                     cfg.scale_fill)
        if cfg.blur_p > 0:
            x, m = random_gaussian_blur(k2, x, m, cfg.blur_p)
        if cfg.hflip_p > 0:
            x, m = random_hflip(k3, x, m, cfg.hflip_p)
        if (cfg.jitter_brightness or cfg.jitter_contrast
                or cfg.jitter_saturation or cfg.jitter_hue):
            x, m = color_jitter(k4, x, m, cfg.jitter_p,
                                cfg.jitter_brightness, cfg.jitter_contrast,
                                cfg.jitter_saturation, cfg.jitter_hue,
                                random_order=cfg.jitter_random_order)
        x = to_tensor_normalize(x, cfg.mean, cfg.std, compute_dtype)
        return x, m.astype(jnp.int32)

    return fn


def make_eval_normalize(mean, std, compute_dtype=jnp.float32):
    """valid pipeline: ToTensor + Normalize only (train.py:71-75)."""
    def fn(images, masks=None):
        x = to_tensor_normalize(images, mean, std, compute_dtype)
        if masks is None:
            return x
        return x, masks.astype(jnp.int32)
    return fn
