"""Backward-pass parity: gradients of conv+BN+ReLU -> cross-entropy match
torch autograd (the training path's one piece not covered by the forward
goldens; optimizer/schedule parity is tested separately)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from pytorch_camvid_tpu.ops.conv import conv_bn_relu_init, conv_bn_relu_apply
from pytorch_camvid_tpu.ops.loss import cross_entropy_loss


def test_conv_bn_relu_ce_grads_match_torch():
    params, state = conv_bn_relu_init(jax.random.PRNGKey(0), 3, 6)
    x = np.random.default_rng(1).normal(size=(2, 8, 10, 3)).astype(
        np.float32)
    y = np.random.default_rng(2).integers(0, 6, size=(2, 8, 10))

    def loss_fn(p):
        out, _ = conv_bn_relu_apply(p, state, jnp.asarray(x), train=True)
        return cross_entropy_loss(out, jnp.asarray(y))

    loss, grads = jax.value_and_grad(loss_fn)(params)

    conv = nn.Conv2d(3, 6, 3, padding=1)
    bn = nn.BatchNorm2d(6)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(
            np.asarray(params["w"]).transpose(3, 2, 0, 1).copy()))
        conv.bias.copy_(torch.from_numpy(np.asarray(params["b"]).copy()))
        bn.weight.copy_(torch.from_numpy(
            np.asarray(params["scale"]).copy()))
        bn.bias.copy_(torch.from_numpy(np.asarray(params["bias"]).copy()))
    conv.train(); bn.train()
    out = F.relu(bn(conv(torch.from_numpy(x.transpose(0, 3, 1, 2)))))
    tloss = F.cross_entropy(out, torch.from_numpy(y))
    tloss.backward()

    np.testing.assert_allclose(float(loss), float(tloss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads["w"]),
        conv.weight.grad.numpy().transpose(2, 3, 1, 0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(grads["b"]),
                               conv.bias.grad.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(grads["scale"]),
                               bn.weight.grad.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(grads["bias"]),
                               bn.bias.grad.numpy(), atol=1e-5)


def test_unpool_grads_flow_through_indices():
    # gradient flows to pooled values, not to the (integer) indices
    from pytorch_camvid_tpu.ops.pooling import (
        max_pool_2x2_with_argmax, max_unpool_2x2)
    x = np.random.default_rng(3).normal(size=(1, 6, 6, 2)).astype(
        np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
    tp, ti = F.max_pool2d(xt, 2, return_indices=True)
    F.max_unpool2d(tp, ti, 2, output_size=xt.shape).square().sum().backward()
    want = xt.grad.numpy().transpose(0, 2, 3, 1)

    def loss_fn(xj):
        p, i = max_pool_2x2_with_argmax(xj)
        return jnp.sum(jnp.square(max_unpool_2x2(p, i, (6, 6))))

    got = jax.grad(loss_fn)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
