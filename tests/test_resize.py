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


def test_resize_bilinear_dynamic_matches_static_and_cv2():
    """resize_bilinear_cv2_dynamic on a zero-padded bucket buffer equals
    the static resize (and therefore cv2) on the unpadded image, for a
    spread of source extents inside the same bucket — the serving shape
    policy's correctness claim (ops/resize.py, serving.py)."""
    from pytorch_camvid_tpu.ops.resize import resize_bilinear_cv2_dynamic

    rng = np.random.default_rng(5)
    out_hw = (48, 64)
    bucket = (128, 128)
    for (h, w) in [(37, 53), (64, 64), (100, 120), (128, 128), (17, 97)]:
        img = rng.uniform(0, 255, size=(2, h, w, 3)).astype(np.float32)
        want = np.asarray(resize_bilinear_cv2(jnp.asarray(img), out_hw))
        padded = np.zeros((2,) + bucket + (3,), np.float32)
        padded[:, :h, :w] = img
        got = np.asarray(resize_bilinear_cv2_dynamic(
            jnp.asarray(padded), jnp.int32(h), jnp.int32(w), out_hw))
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4,
                                   err_msg=f"{h}x{w}")
        # and cv2 itself agrees (the end-to-end oracle)
        ref = np.stack([cv2.resize(im, (out_hw[1], out_hw[0]),
                                   interpolation=cv2.INTER_LINEAR)
                        for im in img])
        np.testing.assert_allclose(got, ref, atol=1e-2, rtol=1e-3,
                                   err_msg=f"cv2 {h}x{w}")
