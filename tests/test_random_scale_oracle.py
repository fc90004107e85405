"""RandomScale deterministic-core parity vs a cv2 oracle transcribing the
reference algorithm (transforms.py:85-127: resize -> centered pad -> crop)."""

import cv2
import numpy as np
import jax.numpy as jnp

from pytorch_camvid_tpu.data.augment import scale_pad_crop


def _oracle(img, mask, scale, y1, x1, fill):
    # reference algorithm transcription (transforms.py:85-127)
    oh, ow = img.shape[:2]
    img = cv2.resize(img, (0, 0), fx=scale, fy=scale)
    mask = cv2.resize(mask, (0, 0), fx=scale, fy=scale,
                      interpolation=cv2.INTER_NEAREST)
    h, w = img.shape[:2]
    dh, dw = max(0, oh - h), max(0, ow - w)
    img = cv2.copyMakeBorder(img, dh // 2, dh - dh // 2, dw // 2,
                             dw - dw // 2, cv2.BORDER_CONSTANT,
                             value=[0, 0, 0])
    mask = cv2.copyMakeBorder(mask, dh // 2, dh - dh // 2, dw // 2,
                              dw - dw // 2, cv2.BORDER_CONSTANT, value=fill)
    return (img[y1: y1 + oh, x1: x1 + ow], mask[y1: y1 + oh, x1: x1 + ow])


def test_scale_pad_crop_matches_cv2_oracle():
    rng = np.random.default_rng(0)
    h, w = 40, 56
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.float32)
    mask = rng.integers(0, 11, size=(h, w)).astype(np.uint8)

    for scale, uy, ux in [(0.5, 0.0, 0.0), (1.7, 0.3, 0.8),
                          (2.0, 0.99, 0.01), (1.0, 0.0, 0.0)]:
        sh, sw = round(h * scale), round(w * scale)
        max_y, max_x = max(sh, h) - h, max(sw, w) - w
        y1 = int(np.floor(uy * (max_y + 1)))
        x1 = int(np.floor(ux * (max_x + 1)))
        want_i, want_m = _oracle(img, mask, scale, y1, x1, fill=11)

        got_i, got_m = scale_pad_crop(
            jnp.asarray(img)[None], jnp.asarray(mask)[None],
            jnp.asarray([scale]), jnp.asarray([uy]), jnp.asarray([ux]),
            fill=11)
        got_i, got_m = np.asarray(got_i)[0], np.asarray(got_m)[0]

        assert got_i.shape == want_i.shape == (h, w, 3)
        # bilinear: tolerate 1-intensity differences at resampling edges
        close = np.abs(got_i - want_i.astype(np.float32)) <= 1.5
        assert close.mean() > 0.98, (scale, close.mean())
        # nearest mask: overwhelming agreement (rounding ties can differ)
        agree = (got_m == want_m).mean()
        assert agree > 0.97, (scale, agree)
