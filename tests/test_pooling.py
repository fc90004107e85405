"""Golden tests: pooling ops vs torch (reference models/segnet.py:79-80,
models/unet.py:92)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from pytorch_camvid_tpu.ops.pooling import (
    max_pool_2x2, max_pool_2x2_with_argmax, max_unpool_2x2,
    max_pool_2x2_with_phase, max_unpool_2x2_from_phase, phase_to_flat_index)


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


def test_max_pool_with_phase_matches_torch():
    # float inputs + quantized (tie-heavy) inputs: phase expanded to flat
    # indices must equal torch's return_indices exactly, including
    # first-maximum tie resolution over the window scan order
    for h, w in [(8, 8), (9, 7), (22, 30)]:
        for quant in (False, True):
            x = _rand((2, h, w, 4), seed=h * 10 + w + quant)
            if quant:  # 3-level quantization: ~every window has ties
                x = np.round(x).astype(np.float32)
            pooled, k = max_pool_2x2_with_phase(jnp.asarray(x))
            assert k.dtype == jnp.int8
            idx = phase_to_flat_index(k, w)
            tp, ti = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                                  2, return_indices=True)
            np.testing.assert_allclose(np.asarray(pooled),
                                       tp.permute(0, 2, 3, 1).numpy())
            np.testing.assert_array_equal(np.asarray(idx),
                                          ti.permute(0, 2, 3, 1).numpy())


def test_max_unpool_from_phase_matches_torch():
    # includes odd output sizes (torch output_size semantics)
    for h, w in [(8, 8), (9, 7), (45, 61)]:
        x = _rand((2, h, w, 3), seed=h + w)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        tp, ti = F.max_pool2d(xt, 2, return_indices=True)
        want = F.max_unpool2d(tp, ti, 2, output_size=xt.shape)
        want = want.permute(0, 2, 3, 1).numpy()

        pooled, k = max_pool_2x2_with_phase(jnp.asarray(x))
        got = np.asarray(max_unpool_2x2_from_phase(pooled, k, (h, w)))
        np.testing.assert_allclose(got, want)


def test_phase_and_argmax_pairs_agree():
    # the two implementations are interchangeable inside SegNet: same
    # pooled values, same unpooled plane (incl. ties via quantization)
    x = np.round(_rand((3, 12, 10, 8), seed=9) * 2).astype(np.float32) / 2
    pa, idx = max_pool_2x2_with_argmax(jnp.asarray(x))
    pp, k = max_pool_2x2_with_phase(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pp))
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.asarray(phase_to_flat_index(k, 10)))
    ua = max_unpool_2x2(pa, idx, (12, 10))
    up = max_unpool_2x2_from_phase(pp, k, (12, 10))
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(up))


def test_argmax_phase_pool_matches_torch():
    # hybrid pool (argmax candidate transpose -> int8 phase, PERF.md r3):
    # values + unpool placement must match torch exactly, and the phase
    # must expand to torch's flat index convention
    from pytorch_camvid_tpu.ops.pooling import max_pool_2x2_argmax_phase
    for h, w in [(8, 8), (9, 7), (22, 30)]:
        x = _rand((2, h, w, 4), seed=h * 7 + w)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        tp, ti = F.max_pool2d(xt, 2, return_indices=True)
        pooled, k = max_pool_2x2_argmax_phase(jnp.asarray(x))
        assert k.dtype == jnp.int8
        np.testing.assert_allclose(np.asarray(pooled),
                                   tp.permute(0, 2, 3, 1).numpy())
        np.testing.assert_array_equal(
            np.asarray(phase_to_flat_index(k, w)),
            ti.permute(0, 2, 3, 1).numpy())
        want = F.max_unpool2d(tp, ti, 2, output_size=xt.shape)
        got = np.asarray(max_unpool_2x2_from_phase(pooled, k, (h, w)))
        np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy())
