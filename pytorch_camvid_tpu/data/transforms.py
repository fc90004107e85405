"""Class-based paired-transform API (reference: transforms.py).

Migration-surface parity: the same class names and call signature
``t(img, mask) -> (img, mask)`` as the reference's OpenCV transform classes,
so per-sample code ports unchanged. Each class wraps the batched jittable
ops in data/augment.py (adding/removing the batch dim); randomness comes
from an internal counter-based PRNG key so behavior is reproducible.

The TPU hot path does NOT use these — training composes the batched ops
directly (make_train_augment). These exist for the dataset-level
``transforms=`` hooks and interactive use.

Reference probability quirks are preserved per class (SURVEY.md §2.5.1-2):
RandomRotation/ColorJitter SKIP when u < p; HorizontalFlip/GaussianBlur
APPLY when u < p.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.data import augment as A
from pytorch_camvid_tpu.ops.resize import (
    resize_bilinear_cv2, resize_nearest_cv2)


class _Rng:
    _counter = 0

    @classmethod
    def key(cls):
        cls._counter += 1
        return jax.random.PRNGKey(cls._counter)

    @classmethod
    def seed(cls, s: int):
        cls._counter = int(s) << 16


def seed(s: int):
    """Seed the transform RNG stream (reproducible pipelines)."""
    _Rng.seed(s)


def _b(img):  # to batched jnp
    return jnp.asarray(img)[None]


def _ub(img):  # from batched jnp
    return np.asarray(img[0])


class Compose:
    """transforms.py:17-39."""

    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img, mask):
        for trans in self.transforms:
            img, mask = trans(img, mask)
        return img, mask

    def __repr__(self):
        inner = "\n".join(f"    {t}" for t in self.transforms)
        return f"{self.__class__.__name__}(\n{inner}\n)"


class Resize:
    """transforms.py:41-61 — size is (w, h) in cv2 order."""

    def __init__(self, size):
        if isinstance(size, int):
            self.size = (size, size)
        elif isinstance(size, Iterable) and len(size) == 2:
            self.size = tuple(size)
        else:
            raise TypeError("size should be iterable with size 2 or int")

    def __call__(self, img, mask):
        w, h = self.size
        im = _ub(resize_bilinear_cv2(_b(np.asarray(img, np.float32)),
                                     (h, w)))
        if img.dtype == np.uint8:
            im = np.round(im).clip(0, 255).astype(np.uint8)
        mk = _ub(resize_nearest_cv2(_b(mask), (h, w)))
        return im, mk


class RandomScale:
    """transforms.py:63-127."""

    def __init__(self, scale=(0.5, 2.0), value=0):
        self.scale = scale
        self.value = value

    def __call__(self, img, mask):
        im, mk = A.random_scale_crop(
            _Rng.key(), _b(np.asarray(img, np.float32)), _b(mask),
            self.scale, self.value)
        im = _ub(im)
        if np.asarray(img).dtype == np.uint8:
            # cv2.resize on uint8 rounds back to uint8; keep the chain
            # integer so downstream LUT transforms stay exact
            im = np.round(im).clip(0, 255).astype(np.uint8)
        return im, _ub(mk)


class RandomRotation:
    """transforms.py:129-164 — first positional arg is p (the reference
    quirk; train.py:63 passes 15 and never rotates)."""

    def __init__(self, p=0.5, angle=10, fill=0):
        if not angle > 0:
            raise ValueError("angle must be a positive number.")
        self.p, self.angle, self.value = p, angle, fill

    def __call__(self, img, mask):
        im, mk = A.random_rotation(_Rng.key(), _b(np.asarray(
            img, np.float32)), _b(mask), self.p, self.angle, self.value)
        im = _ub(im)
        if np.asarray(img).dtype == np.uint8:
            im = np.round(im).clip(0, 255).astype(np.uint8)
        return im, _ub(mk)


class RandomHorizontalFlip:
    """transforms.py:166-187."""

    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img, mask):
        im, mk = A.random_hflip(_Rng.key(), _b(img), _b(mask), self.p)
        return _ub(im), _ub(mk)


class RandomGaussianBlur:
    """transforms.py:189-238."""

    def __init__(self, p=0.5, sigma=(0.0, 3.0)):
        if not sigma[1] >= sigma[0] >= 0:
            raise ValueError(
                "sigma shoule be an iterval of nonegative real number")
        self.p, self.sigma = p, sigma

    def __call__(self, img, mask):
        im, mk = A.random_gaussian_blur(_Rng.key(), _b(np.asarray(
            img, np.float32)), _b(mask), self.p, self.sigma)
        im = _ub(im)
        if np.asarray(img).dtype == np.uint8:
            im = np.round(im).clip(0, 255).astype(np.uint8)
        return im, _ub(mk)


class Lambda:
    """transforms.py:349-362."""

    def __init__(self, lambd):
        assert callable(lambd)
        self.lambd = lambd

    def __call__(self, img, mask):
        return self.lambd(img), mask


class ColorJitter:
    """transforms.py:364-483 — p first, then brightness/contrast/
    saturation/hue; skips when u < p."""

    def __init__(self, p=0.5, brightness=0, contrast=0, saturation=0,
                 hue=0):
        self.p = p
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def __call__(self, img, mask):
        im, mk = A.color_jitter(_Rng.key(), _b(img), _b(mask), self.p,
                                self.brightness, self.contrast,
                                self.saturation, self.hue)
        im = _ub(im)
        if np.asarray(img).dtype == np.uint8:
            im = im.clip(0, 255).astype(np.uint8)
        return im, _ub(mk)


class ToTensor:
    """transforms.py:485-505 — to float [0,1]; stays HWC (TPU-native NHWC
    rather than the reference's CHW) and int32 mask."""

    def __call__(self, img, mask):
        return (np.asarray(img, np.float32) / 255.0,
                np.asarray(mask, np.int32))


class Normalize:
    """transforms.py:507-539 — per-channel (x - mean) / std on the [0,1]
    float image; mask untouched."""

    def __init__(self, mean, std, inplace=False):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img, mask):
        return (np.asarray(img, np.float32) - self.mean) / self.std, mask
