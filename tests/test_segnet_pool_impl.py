"""SegNet's TPU production pool path (the Pallas packed-phase pair) vs the
CPU-default XLA argmax pair — same forward, same gradients.

On TPU `models/segnet.py::_pool_impl` selects the Pallas pair
automatically; CPU backends (this suite) get the XLA pair, so without
this test the *model-level wiring* of the Pallas pair would only ever be
exercised on hardware. Here the selector is forced via PCT_POOL_IMPL and
the kernels run in interpret mode.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.models.segnet import init_segnet, apply_segnet
from pytorch_camvid_tpu.ops import pallas_pool as pp


def _interpret_kernels(monkeypatch):
    for name in ("max_pool_2x2_phase_packed", "max_pool_2x2_phase_mxu",
                 "max_unpool_2x2_phase_nat", "_unpool_phase_packed_grad",
                 "_unpool_phase_grad_mxu"):
        monkeypatch.setattr(pp, name, functools.partial(
            getattr(pp, name), interpret=True))


def test_segnet_pallas_phase_pool_matches_argmax_forward_and_grad(
        monkeypatch):
    _interpret_kernels(monkeypatch)
    rng = np.random.default_rng(0)
    # odd spatial dims exercise the unpool output_size padding through the
    # whole encoder/decoder (reference models/segnet.py:104)
    x = jnp.asarray(rng.normal(size=(1, 36, 44, 3)).astype(np.float32))
    variables = init_segnet(jax.random.PRNGKey(0), 3, 12)

    def loss_with(impl):
        monkeypatch.setenv("PCT_POOL_IMPL", impl)

        def loss_fn(v):
            logits, _ = apply_segnet(v, x, train=True)
            return jnp.sum(logits * logits)

        l, g = jax.value_and_grad(
            lambda p: loss_fn({"params": p,
                               "state": variables["state"]}))(
            variables["params"])
        return float(l), g

    want_l, want_g = loss_with("argmax")
    got_l, got_g = loss_with("pallas_phase")
    np.testing.assert_allclose(got_l, want_l, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(got_g), jax.tree.leaves(want_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_segnet_pool_impl_selector_defaults(monkeypatch):
    from pytorch_camvid_tpu.models.segnet import _pool_impl
    monkeypatch.delenv("PCT_POOL_IMPL", raising=False)
    # CPU suite: default must be the XLA pair (Pallas needs a TPU)
    assert _pool_impl() == "argmax"
    monkeypatch.setenv("PCT_POOL_IMPL", "pallas_phase")
    assert _pool_impl() == "pallas_phase"
