"""Pallas kernels vs the lax reference implementations (interpret mode on
the CPU backend; the real-TPU path is exercised by bench/serving)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.ops.conv import conv_bn_relu_init, conv_bn_relu_apply
from pytorch_camvid_tpu.ops.pallas_conv import (
    conv_bn_relu_apply_pallas, conv3x3_bn_relu_pallas, fold_bn_affine)
from pytorch_camvid_tpu.ops.pallas_pool import (
    max_pool_2x2_argmax_pallas, max_unpool_2x2_pallas)
from pytorch_camvid_tpu.ops.pooling import (
    max_pool_2x2_with_argmax, max_unpool_2x2)


def test_pallas_conv_bn_relu_matches_lax():
    key = jax.random.PRNGKey(0)
    params, state = conv_bn_relu_init(key, 8, 16)
    state = {"mean": jnp.asarray(np.random.default_rng(1).normal(
        size=16).astype(np.float32)),
        "var": jnp.asarray(np.random.default_rng(2).uniform(
            0.5, 2.0, size=16).astype(np.float32))}
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 12, 20, 8)).astype(np.float32))

    want, _ = conv_bn_relu_apply(params, state, x, train=False)
    got, _ = conv_bn_relu_apply_pallas(params, state, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_pallas_conv_tiles_over_cout_and_rows():
    # cout 256 forces Cout tiling; h=8 with tile budget exercises row tiles
    key = jax.random.PRNGKey(1)
    params, state = conv_bn_relu_init(key, 128, 256)
    x = jnp.asarray(np.random.default_rng(5).normal(
        size=(1, 8, 16, 128)).astype(np.float32))
    a, b = fold_bn_affine(params, state)
    got = conv3x3_bn_relu_pallas(x, params["w"], a, b, interpret=True)
    want, _ = conv_bn_relu_apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_pallas_pool_matches_lax():
    x = jnp.asarray(np.random.default_rng(7).normal(
        size=(2, 12, 16, 5)).astype(np.float32))
    want_p, want_i = max_pool_2x2_with_argmax(x)
    got_p, got_i = max_pool_2x2_argmax_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_pallas_pool_odd_dims_floor():
    x = jnp.asarray(np.random.default_rng(8).normal(
        size=(1, 9, 7, 3)).astype(np.float32))
    want_p, want_i = max_pool_2x2_with_argmax(x)
    got_p, got_i = max_pool_2x2_argmax_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_pallas_unpool_matches_lax_including_odd():
    for h, w in [(12, 16), (9, 7)]:
        x = jnp.asarray(np.random.default_rng(h).normal(
            size=(2, h, w, 4)).astype(np.float32))
        pooled, idx = max_pool_2x2_with_argmax(x)
        want = max_unpool_2x2(pooled, idx, (h, w))
        got = max_unpool_2x2_pallas(pooled, idx, (h, w), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_packed_phase_pool_matches_argmax_phase():
    from pytorch_camvid_tpu.ops.pallas_pool import max_pool_2x2_phase_packed
    from pytorch_camvid_tpu.ops.pooling import max_pool_2x2_argmax_phase
    # ties included: quantized values force equal candidates in-window
    rng = np.random.default_rng(11)
    for h, w, c in [(12, 16, 4), (9, 7, 3), (8, 8, 64)]:
        x = jnp.asarray(np.round(rng.normal(size=(2, h, w, c)) * 2) / 2
                        ).astype(jnp.float32)
        want_p, want_k = max_pool_2x2_argmax_phase(x)
        got_p, got_k = max_pool_2x2_phase_packed(x, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))


def test_packed_phase_unpool_matches_phase_mask_including_odd():
    from pytorch_camvid_tpu.ops.pallas_pool import (
        max_pool_2x2_phase_packed, max_unpool_2x2_phase_packed,
        max_unpool_2x2_phase_nat)
    from pytorch_camvid_tpu.ops.pooling import max_unpool_2x2_from_phase
    rng = np.random.default_rng(12)
    for h, w in [(12, 16), (9, 7)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, 4)).astype(np.float32))
        pooled, k = max_pool_2x2_phase_packed(x, interpret=True)
        want = max_unpool_2x2_from_phase(pooled, k, (h, w))
        for unpool in (max_unpool_2x2_phase_packed,
                       max_unpool_2x2_phase_nat):
            got = unpool(pooled, k, (h, w), interpret=True)
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(want))


def test_mxu_phase_pool_matches_packed():
    """MXU-selection pool (natural layout, selection matmuls) is bit-equal
    to the packed-view kernel and the lax reference, ties included."""
    from pytorch_camvid_tpu.ops.pallas_pool import max_pool_2x2_phase_mxu
    from pytorch_camvid_tpu.ops.pooling import max_pool_2x2_argmax_phase
    rng = np.random.default_rng(21)
    for h, w, c in [(12, 16, 4), (9, 7, 3), (8, 8, 64)]:
        x = jnp.asarray(np.round(rng.normal(size=(2, h, w, c)) * 2) / 2
                        ).astype(jnp.float32)
        want_p, want_k = max_pool_2x2_argmax_phase(x)
        got_p, got_k = max_pool_2x2_phase_mxu(x, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))


def test_mxu_unpool_grad_matches_packed_grad():
    from pytorch_camvid_tpu.ops import pallas_pool as pp
    rng = np.random.default_rng(22)
    g = jnp.asarray(rng.normal(size=(2, 12, 16, 4)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 12, 16, 4)).astype(np.float32))
    _, k = pp.max_pool_2x2_phase_packed(x, interpret=True)
    want = pp._unpool_phase_packed_grad(g, k, interpret=True)
    got = pp._unpool_phase_grad_mxu(g, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_packed_phase_train_pair_grads_match_xla_autodiff():
    """custom-VJP pool/unpool pair vs jax.grad through the lax
    compositions (ops/pooling.py) — same loss, same gradient."""
    from pytorch_camvid_tpu.ops import pallas_pool as pp
    from pytorch_camvid_tpu.ops.pooling import (
        max_pool_2x2_argmax_phase, max_unpool_2x2_from_phase)
    rng = np.random.default_rng(13)
    # distinct values: at exact ties torch-order argmax subgradients are
    # convention, not calculus — keep the comparison on the smooth region
    x = jnp.asarray(rng.permutation(12 * 16 * 3 * 2).reshape(
        2, 12, 16, 3).astype(np.float32))
    wgt = jnp.asarray(rng.normal(size=(2, 12, 16, 3)).astype(np.float32))

    def loss_ref(v):
        p, k = max_pool_2x2_argmax_phase(v)
        up = max_unpool_2x2_from_phase(p * 1.5, k, (12, 16))
        return jnp.sum(up * wgt)

    def loss_packed(v):
        p, k = pp.pool_phase_packed_train(v)
        up = pp.unpool_phase_packed_train(p * 1.5, k, (12, 16))
        return jnp.sum(up * wgt)

    import unittest.mock as mock
    # route the train pair through interpret mode on the CPU backend
    with mock.patch.object(pp, "max_pool_2x2_phase_packed",
                           functools.partial(pp.max_pool_2x2_phase_packed,
                                             interpret=True)), \
         mock.patch.object(pp, "max_pool_2x2_phase_mxu",
                           functools.partial(pp.max_pool_2x2_phase_mxu,
                                             interpret=True)), \
         mock.patch.object(pp, "max_unpool_2x2_phase_nat",
                           functools.partial(
                               pp.max_unpool_2x2_phase_nat,
                               interpret=True)), \
         mock.patch.object(pp, "_unpool_phase_packed_grad",
                           functools.partial(pp._unpool_phase_packed_grad,
                                             interpret=True)), \
         mock.patch.object(pp, "_unpool_phase_grad_mxu",
                           functools.partial(pp._unpool_phase_grad_mxu,
                                             interpret=True)):
        got_l, got_g = jax.value_and_grad(loss_packed)(x)
    want_l, want_g = jax.value_and_grad(loss_ref)(x)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_g), np.asarray(want_g))
