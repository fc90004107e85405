"""Oracle tests for the H-pair lane-packed conv kernel
(ops/pallas_conv_pair.py) in Pallas interpret mode.

The pair-tap block matrices must make the packed 9-tap matmul exactly
equal to the direct 3x3 conv (reference op: ``nn.Conv2d(3,3,pad=1)``,
/root/reference/models/unet.py:11); the zero blocks contribute exact
zeros, so equality holds to accumulation order."""

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.ops.conv import conv2d
from pytorch_camvid_tpu.ops.pallas_conv_pair import (
    _build_pair_taps, conv3x3_pair, conv3x3_pair_bn_relu)


def _rand(shape, seed, scale=1.0):
    return (np.random.default_rng(seed).normal(size=shape) * scale
            ).astype(np.float32)


def test_pair_taps_block_structure():
    w = jnp.asarray(_rand((3, 3, 4, 6), 0))
    m = np.asarray(_build_pair_taps(w))
    wn = np.asarray(w)
    # dρ=0: only x(2r-1) -> y(2r)
    assert np.allclose(m[0, :, 4:, :6], wn[0])
    assert (m[0, :, :4, :] == 0).all() and (m[0, :, :, 6:] == 0).all()
    # dρ=2: only x(2r+2) -> y(2r+1)
    assert np.allclose(m[2, :, :4, 6:], wn[2])
    assert (m[2, :, 4:, :] == 0).all() and (m[2, :, :, :6] == 0).all()
    # dρ=1: full 2x2 block layout
    assert np.allclose(m[1, :, :4, :6], wn[1])
    assert np.allclose(m[1, :, :4, 6:], wn[0])
    assert np.allclose(m[1, :, 4:, :6], wn[2])
    assert np.allclose(m[1, :, 4:, 6:], wn[1])


def test_pair_conv_matches_xla_conv():
    """Pair kernel (interpret) == XLA direct conv, f32, several shapes
    including non-8-multiple W and multi-row tiles."""
    for (n, h, w_sp, c, co, seed) in [(2, 12, 30, 8, 8, 1),
                                      (1, 8, 15, 16, 8, 2),
                                      (2, 20, 24, 8, 16, 3)]:
        x = jnp.asarray(_rand((n, h, w_sp, c), seed))
        w = jnp.asarray(_rand((3, 3, c, co), seed + 10, 0.1))
        b = jnp.asarray(_rand((co,), seed + 20))
        want = conv2d(x, w, b, allow_wgroup=False)
        got = conv3x3_pair(x, w, b, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)


def test_pair_conv_fused_affine_relu():
    n, h, w_sp, c, co = 1, 10, 17, 8, 8
    x = jnp.asarray(_rand((n, h, w_sp, c), 4))
    w = jnp.asarray(_rand((3, 3, c, co), 5, 0.1))
    a = jnp.asarray(_rand((co,), 6))
    b = jnp.asarray(_rand((co,), 7))
    raw = conv2d(x, w, jnp.zeros((co,)), allow_wgroup=False)
    want = jnp.maximum(raw * a + b, 0.0)
    got = conv3x3_pair_bn_relu(x, w, a, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_pair_conv_bf16_production_shape_scaled_down():
    """bf16 path on a scaled-down version of the production
    (360,480,64->64) target (H/6, W/8 keeps even-H + the WQ padding
    geometry)."""
    n, h, w_sp, c, co = 2, 60, 60, 64, 64
    x = jnp.asarray(_rand((n, h, w_sp, c), 8)).astype(jnp.bfloat16)
    w = jnp.asarray(_rand((3, 3, c, co), 9, 0.05)).astype(jnp.bfloat16)
    b = jnp.asarray(_rand((co,), 10))
    want = np.asarray(conv2d(x, w, b, allow_wgroup=False),
                      np.float32)
    got = np.asarray(conv3x3_pair(x, w, b, interpret=True), np.float32)
    # bf16 inputs, f32 accumulation both sides; tap-order difference only
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


def test_pair_conv_kstack_matches_xla_conv():
    """The K-stacked single-dot variant is real math too."""
    from pytorch_camvid_tpu.ops.pallas_conv_pair import (
        conv3x3_pair_bn_relu)
    n, h, w_sp, c, co = 2, 12, 30, 8, 8
    x = jnp.asarray(_rand((n, h, w_sp, c), 11))
    w = jnp.asarray(_rand((3, 3, c, co), 12, 0.1))
    a = jnp.ones((co,), jnp.float32)
    b = jnp.asarray(_rand((co,), 13))
    want = conv2d(x, w, jnp.zeros((co,)), allow_wgroup=False) + b
    got = conv3x3_pair_bn_relu(x, w, a, b, interpret=True, relu=False,
                               control_aligned="kstack")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
