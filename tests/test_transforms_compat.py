"""Class-based transform API parity (data/transforms.py vs transforms.py
semantics)."""

import numpy as np
import cv2

from pytorch_camvid_tpu.data import transforms as T


def _pair(h=40, w=56, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8),
            rng.integers(0, 12, size=(h, w), dtype=np.uint8))


def test_compose_pipeline_runs():
    T.seed(0)
    img, mask = _pair()
    pipe = T.Compose([
        T.Resize((64, 48)),
        T.RandomRotation(15, fill=11),   # p=15 -> never rotates (quirk)
        T.RandomGaussianBlur(),
        T.RandomHorizontalFlip(),
        T.ColorJitter(0.4, 0.4),
        T.ToTensor(),
        T.Normalize((0.42, 0.41, 0.40), (0.30, 0.31, 0.305)),
    ])
    out_img, out_mask = pipe(img, mask)
    assert out_img.shape == (48, 64, 3) and out_img.dtype == np.float32
    assert out_mask.shape == (48, 64)
    assert set(np.unique(out_mask)) <= set(range(12))
    assert repr(pipe).startswith("Compose(")


def test_resize_matches_cv2():
    img, mask = _pair()
    ri, rm = T.Resize((30, 20))(img, mask)
    want_m = cv2.resize(mask, (30, 20), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(rm, want_m)
    want_i = cv2.resize(img.astype(np.float32), (30, 20))
    assert np.abs(ri.astype(np.float32) - want_i).max() <= 1.0


def test_hflip_p1_exact():
    img, mask = _pair(seed=1)
    fi, fm = T.RandomHorizontalFlip(p=1.0)(img, mask)
    np.testing.assert_array_equal(fi, img[:, ::-1])
    np.testing.assert_array_equal(fm, mask[:, ::-1])


def test_rotation_quirk_p_ge_1_never_applies():
    img, mask = _pair(seed=2)
    oi, om = T.RandomRotation(15, fill=11)(img, mask)
    np.testing.assert_array_equal(oi, img)
    np.testing.assert_array_equal(om, mask)


def test_to_tensor_normalize_formula():
    img, mask = _pair(seed=3)
    t, m = T.ToTensor()(img, mask)
    assert t.max() <= 1.0 and m.dtype == np.int32
    n, _ = T.Normalize((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))(t, m)
    np.testing.assert_allclose(n, (img / 255.0 - 0.5) / 0.25, atol=1e-6)


def test_seeded_reproducibility():
    img, mask = _pair(seed=4)
    T.seed(42)
    a = T.RandomScale(value=11)(img, mask)
    T.seed(42)
    b = T.RandomScale(value=11)(img, mask)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
