"""Model tests: parameter-count parity with the reference (README.md:39-40)
and forward shape/behavior on odd spatial sizes."""

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.models import get_model


def _count_params(variables):
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(variables["params"]))


def test_unet_param_count_34_5m():
    init_fn, _ = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    n = _count_params(variables)
    # torch counts conv w+b and BN scale+bias (running stats are buffers)
    # analytic: sum over blocks of 9*cin*cout + cout + 2*cout
    blocks = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
              (256, 256), (256, 512), (512, 512), (512, 1024), (1024, 1024),
              (1024, 512), (1024, 512), (512, 512),
              (512, 256), (512, 256), (256, 256),
              (256, 128), (256, 128), (128, 128),
              (128, 64), (128, 64), (64, 64), (64, 12)]
    want = sum(9 * ci * co + 3 * co for ci, co in blocks)
    assert n == want
    assert abs(n - 34.5e6) < 0.1e6, n  # README.md:39


def test_segnet_param_count_29_4m():
    init_fn, _ = get_model("segnet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    n = _count_params(variables)
    assert abs(n - 29.4e6) < 0.1e6, n  # README.md:40


def test_unet_forward_shapes_odd_dims():
    # 90x120 exercises the same odd-dim pad-to-match path as 360x480
    # (45->22 rounding, models/unet.py:120-123)
    init_fn, apply_fn = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 90, 120, 3))
    logits, ns = jax.jit(
        lambda v, x: apply_fn(v, x, train=False))(variables, x)
    assert logits.shape == (1, 90, 120, 12)
    # reference quirk kept: output head is conv+BN+ReLU so logits >= 0
    # (models/unet.py:91, SURVEY.md §2.5.6)
    assert float(jnp.min(logits)) >= 0.0


def test_segnet_forward_shapes_odd_dims():
    init_fn, apply_fn = get_model("segnet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 90, 120, 3))
    logits, ns = jax.jit(
        lambda v, x: apply_fn(v, x, train=False))(variables, x)
    assert logits.shape == (1, 90, 120, 12)


def test_train_mode_updates_bn_state():
    init_fn, apply_fn = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    _, ns = apply_fn(variables, x, train=True)
    before = variables["state"]["down1"][0]["mean"]
    after = ns["down1"][0]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_get_model_rejects_unknown():
    import pytest
    with pytest.raises(ValueError):
        get_model("resnet", 3, 12)
