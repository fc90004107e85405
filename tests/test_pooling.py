"""Golden tests: pooling ops vs torch (reference models/segnet.py:79-80,
models/unet.py:92)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from pytorch_camvid_tpu.ops.pooling import (
    max_pool_2x2, max_pool_2x2_with_argmax, max_unpool_2x2)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_max_pool_2x2_matches_torch():
    for h, w in [(8, 8), (9, 7), (45, 60)]:
        x = _rand((2, h, w, 5))
        got = np.asarray(max_pool_2x2(jnp.asarray(x)))
        want = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want)


def test_max_pool_with_argmax_matches_torch():
    for h, w in [(8, 8), (9, 7), (22, 30)]:
        x = _rand((2, h, w, 4), seed=h * 100 + w)
        pooled, idx = max_pool_2x2_with_argmax(jnp.asarray(x))
        tp, ti = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2,
                              return_indices=True)
        np.testing.assert_allclose(np.asarray(pooled),
                                   tp.permute(0, 2, 3, 1).numpy())
        np.testing.assert_array_equal(np.asarray(idx),
                                      ti.permute(0, 2, 3, 1).numpy())


def test_max_unpool_roundtrip_matches_torch():
    # includes odd output sizes (torch output_size semantics,
    # models/segnet.py:104-116)
    for h, w in [(8, 8), (9, 7), (45, 61)]:
        x = _rand((2, h, w, 3), seed=h + w)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        tp, ti = F.max_pool2d(xt, 2, return_indices=True)
        want = F.max_unpool2d(tp, ti, 2, output_size=xt.shape)
        want = want.permute(0, 2, 3, 1).numpy()

        pooled, idx = max_pool_2x2_with_argmax(jnp.asarray(x))
        got = np.asarray(max_unpool_2x2(pooled, idx, (h, w)))
        np.testing.assert_allclose(got, want)


def test_max_unpool_ties_first_wins():
    x = np.zeros((1, 4, 4, 1), np.float32)  # all ties
    pooled, idx = max_pool_2x2_with_argmax(jnp.asarray(x))
    assert np.all(np.asarray(idx) == np.array([[0, 2], [8, 10]])[None, :, :, None])
