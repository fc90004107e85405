"""Golden tests: conv+BN+ReLU block and cross-entropy vs torch
(reference models/unet.py:5-17, train.py:105)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from pytorch_camvid_tpu.ops.conv import conv_bn_relu_init, conv_bn_relu_apply
from pytorch_camvid_tpu.ops.loss import cross_entropy_loss


def _torch_block(cin, cout, params, state):
    conv = nn.Conv2d(cin, cout, 3, padding=1)
    bn = nn.BatchNorm2d(cout)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(
            np.asarray(params["w"]).transpose(3, 2, 0, 1)))
        conv.bias.copy_(torch.from_numpy(np.asarray(params["b"])))
        bn.weight.copy_(torch.from_numpy(np.asarray(params["scale"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
        bn.running_mean.copy_(torch.from_numpy(np.asarray(state["mean"])))
        bn.running_var.copy_(torch.from_numpy(np.asarray(state["var"])))
    return conv, bn


def test_conv_bn_relu_eval_matches_torch():
    params, state = conv_bn_relu_init(jax.random.PRNGKey(0), 5, 8)
    state = {"mean": jnp.asarray(np.random.default_rng(1).normal(
        size=8).astype(np.float32)),
        "var": jnp.asarray(np.random.default_rng(2).uniform(
            0.5, 2.0, size=8).astype(np.float32))}
    x = np.random.default_rng(3).normal(size=(2, 9, 11, 5)).astype(np.float32)

    got, new_state = conv_bn_relu_apply(params, state, jnp.asarray(x),
                                        train=False)
    conv, bn = _torch_block(5, 8, params, state)
    conv.eval(); bn.eval()
    with torch.no_grad():
        want = F.relu(bn(conv(torch.from_numpy(x).permute(0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               atol=1e-4, rtol=1e-4)
    assert new_state is state  # eval does not touch running stats


def test_conv_bn_relu_train_matches_torch():
    params, state = conv_bn_relu_init(jax.random.PRNGKey(0), 3, 4)
    x = np.random.default_rng(5).normal(size=(4, 8, 8, 3)).astype(np.float32)

    got, new_state = conv_bn_relu_apply(params, state, jnp.asarray(x),
                                        train=True)
    conv, bn = _torch_block(3, 4, params, state)
    conv.train(); bn.train()
    want = F.relu(bn(conv(torch.from_numpy(x).permute(0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(got),
                               want.detach().permute(0, 2, 3, 1).numpy(),
                               atol=1e-4, rtol=1e-4)
    # running-stat update parity (torch momentum 0.1, unbiased var)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               bn.running_mean.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               bn.running_var.detach().numpy(),
                               atol=1e-5, rtol=1e-5)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(2, 6, 5, 12)).astype(np.float32)
    labels = rng.integers(0, 12, size=(2, 6, 5))
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    yt = torch.from_numpy(labels)

    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(F.cross_entropy(lt, yt))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # class weights + ignore_index (capability beyond the reference default,
    # BASELINE north-star asks for class-weighted CE)
    w = rng.uniform(0.5, 2.0, size=12).astype(np.float32)
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   class_weights=jnp.asarray(w),
                                   ignore_index=11))
    want = float(F.cross_entropy(lt, yt, weight=torch.from_numpy(w),
                                 ignore_index=11))
    np.testing.assert_allclose(got, want, rtol=1e-5)
