"""Pallas kernels vs the lax reference implementations (interpret mode on
the CPU backend; the real-TPU path is exercised by bench/serving)."""

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
