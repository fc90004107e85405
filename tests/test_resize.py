"""Golden tests: resampling conventions vs torch / cv2
(reference models/unet.py:25, transforms.py:56-61)."""

import cv2
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from pytorch_camvid_tpu.ops.resize import (
    upsample2x_bilinear_align_corners, resize_bilinear_cv2,
    resize_nearest_cv2)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_upsample2x_align_corners_matches_torch():
    for h, w in [(5, 7), (22, 30), (45, 60)]:
        x = _rand((2, h, w, 3), seed=h)
        got = np.asarray(upsample2x_bilinear_align_corners(jnp.asarray(x)))
        want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                             scale_factor=2, mode="bilinear",
                             align_corners=True)
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=5e-5)


def test_resize_bilinear_matches_cv2():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(37, 53, 3)).astype(np.float32)
    for out_wh in [(480, 360), (20, 30), (53, 37)]:
        want = cv2.resize(img, out_wh)  # default INTER_LINEAR
        got = np.asarray(resize_bilinear_cv2(
            jnp.asarray(img)[None], (out_wh[1], out_wh[0])))[0]
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-5)


def test_resize_nearest_matches_cv2():
    rng = np.random.default_rng(4)
    mask = rng.integers(0, 12, size=(37, 53)).astype(np.uint8)
    for out_wh in [(480, 360), (20, 30), (11, 95)]:
        want = cv2.resize(mask, out_wh, interpolation=cv2.INTER_NEAREST)
        got = np.asarray(resize_nearest_cv2(
            jnp.asarray(mask)[None], (out_wh[1], out_wh[0])))[0]
        np.testing.assert_array_equal(got, want)
