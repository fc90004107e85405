"""Training-path Pallas conv (custom VJP) vs lax conv + autodiff
(interpret mode on CPU; real-chip validation mirrors the serving kernels)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from pytorch_camvid_tpu.ops import pallas_conv_train as pct


def _lax_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _with_interpret(fn):
    """Run fn with the pallas_calls in interpreter mode (CPU tests)."""
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pl.pallas_call = pct.pl.pallas_call = patched
    try:
        return fn()
    finally:
        pl.pallas_call = pct.pl.pallas_call = orig


def test_forward_matches_lax():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 12, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
    got = _with_interpret(lambda: pct.conv3x3_pallas(x, w))
    want = _lax_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(2, 8, 10, 8)).astype(np.float32))

    def loss_pallas(x, w):
        return jnp.sum((pct.conv3x3_pallas(x, w) - t) ** 2)

    def loss_lax(x, w):
        return jnp.sum((_lax_conv(x, w) - t) ** 2)

    (lp, (dxp, dwp)) = _with_interpret(
        lambda: jax.value_and_grad(loss_pallas, argnums=(0, 1))(x, w))
    ll, (dxl, dwl) = jax.value_and_grad(loss_lax, argnums=(0, 1))(x, w)

    np.testing.assert_allclose(float(lp), float(ll), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxl),
                               atol=1e-2, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dwp), np.asarray(dwl),
                               atol=1e-2, rtol=1e-3)


def test_vjp_with_cout_tiling_and_grid_accumulation():
    # cin=512/cout=1024 gives tile_co=256 (co grid dim 4) and n=2 with
    # multiple row tiles — exercising the dw kernel's cross-grid
    # accumulation with co OUTERMOST (revisited blocks must be consecutive)
    from pytorch_camvid_tpu.ops.pallas_conv import _pick_tile_co
    assert _pick_tile_co(1024, 512) < 1024  # the path is actually tiled

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 512)).astype(np.float32) * .1)
    w = jnp.asarray(rng.normal(size=(3, 3, 512, 1024)).astype(
        np.float32) * .1)

    def loss_pallas(w):
        return jnp.sum(pct.conv3x3_pallas(x, w) ** 2)

    def loss_lax(w):
        return jnp.sum(_lax_conv(x, w) ** 2)

    dwp = _with_interpret(lambda: jax.grad(loss_pallas)(w))
    dwl = jax.grad(loss_lax)(w)
    np.testing.assert_allclose(np.asarray(dwp), np.asarray(dwl),
                               rtol=2e-3, atol=2e-2)


def test_train_mode_use_pallas_matches_xla_block():
    from pytorch_camvid_tpu.ops.conv import (
        conv_bn_relu_init, conv_bn_relu_apply)
    params, state = conv_bn_relu_init(jax.random.PRNGKey(0), 8, 16)
    x = jnp.asarray(np.random.default_rng(5).normal(
        size=(2, 8, 10, 8)).astype(np.float32))

    want, want_s = conv_bn_relu_apply(params, state, x, train=True)
    got, got_s = _with_interpret(lambda: conv_bn_relu_apply(
        params, state, x, train=True, use_pallas=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(got_s[k]),
                                   np.asarray(want_s[k]), atol=1e-4)


def test_pallas_train_supported_predicate_and_fallback():
    """Shapes whose dW slab cannot tile VMEM (deep bottleneck at small H)
    must report unsupported, and conv_bn_relu_apply(use_pallas=True) must
    fall back to the XLA conv there instead of raising — this is what
    makes whole-model Pallas training runnable as a mixed path
    (tools/pallas_full_train_step.py; chip run in HARDWARE.md)."""
    from pytorch_camvid_tpu.ops.pallas_conv_train import (
        pallas_train_supported)
    from pytorch_camvid_tpu.ops.conv import (
        conv_bn_relu_init, conv_bn_relu_apply)

    # the shape that raised before the fallback: H=22, W=30ish, Cin=1024
    assert not pallas_train_supported((4, 11, 15, 1024), 1024)
    # a production UNet shape that does tile
    assert pallas_train_supported((4, 90, 120, 256), 256)

    # unsupported shape + use_pallas=True runs the XLA conv (no Mosaic on
    # CPU, so reaching pallas_call would fail loudly here)
    params, state = conv_bn_relu_init(jax.random.PRNGKey(0), 1024, 1024)
    x = jnp.asarray(np.random.default_rng(7).normal(
        size=(1, 11, 15, 1024)).astype(np.float32))
    want, _ = conv_bn_relu_apply(params, state, x, train=True)
    got, _ = conv_bn_relu_apply(params, state, x, train=True,
                                use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
