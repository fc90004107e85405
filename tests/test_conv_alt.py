"""Alternative shallow-shape conv formulations match the direct conv
(PERF.md shallow-shape program, VERDICT r2 next-step #3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_camvid_tpu.ops.conv_alt import (
    im2col_conv3x3, s2d_conv3x3, space_to_depth2, wpair_conv3x3,
    _np_reference_conv)


def _lax_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


@pytest.mark.parametrize("shape", [
    (2, 8, 10, 3, 64),     # the RGB stem family
    (1, 12, 8, 64, 64),    # 64-channel full-res pair
    (2, 6, 6, 16, 12),     # narrow head family
])
def test_s2d_and_im2col_match_direct_conv(shape):
    n, h, w_, cin, cout = shape
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, h, w_, cin), jnp.float32)
    w = jax.random.normal(kw, (3, 3, cin, cout), jnp.float32) * 0.1

    want = np.asarray(_lax_conv(x, w))
    np.testing.assert_allclose(  # numpy oracle sanity-checks the oracle
        want, _np_reference_conv(np.asarray(x), np.asarray(w)),
        rtol=1e-4, atol=1e-4)

    got_s2d = np.asarray(jax.jit(s2d_conv3x3)(x, w))
    np.testing.assert_allclose(got_s2d, want, rtol=1e-5, atol=1e-5)

    got_im2col = np.asarray(jax.jit(im2col_conv3x3)(x, w))
    np.testing.assert_allclose(got_im2col, want, rtol=1e-5, atol=1e-5)

    got_wpair = np.asarray(jax.jit(wpair_conv3x3)(x, w))
    np.testing.assert_allclose(got_wpair, want, rtol=1e-5, atol=1e-5)


def test_space_to_depth_layout():
    x = jnp.arange(2 * 4 * 6 * 3).reshape(2, 4, 6, 3)
    z = space_to_depth2(x)
    assert z.shape == (2, 2, 3, 12)
    # channel block (a*2+b)*C+c holds pixel (2i+a, 2j+b, c)
    for a in range(2):
        for b in range(2):
            np.testing.assert_array_equal(
                np.asarray(z[:, 1, 2, (a * 2 + b) * 3:(a * 2 + b + 1) * 3]),
                np.asarray(x[:, 2 + a, 4 + b, :]))


def test_s2d_conv_gradients_match():
    """The formulation must also be trainable: grads w.r.t. x and w agree
    with the direct conv's."""
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (1, 8, 8, 8), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 8, 16), jnp.float32) * 0.1

    def loss_direct(x, w):
        return jnp.sum(jnp.sin(_lax_conv(x, w)))

    def loss_s2d(x, w):
        return jnp.sum(jnp.sin(s2d_conv3x3(x, w)))

    def loss_wpair(x, w):
        return jnp.sum(jnp.sin(wpair_conv3x3(x, w)))

    gx0, gw0 = jax.grad(loss_direct, (0, 1))(x, w)
    for lossf in (loss_s2d, loss_wpair):
        gx1, gw1 = jax.grad(lossf, (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                                   rtol=1e-4, atol=1e-5)
