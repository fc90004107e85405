"""Golden tests: in-framework optimizers vs torch (train.py:100,
legacy/train_tpu.py:77-84), including OneCycle's dynamic beta1."""

import numpy as np
import jax.numpy as jnp
import torch

from pytorch_camvid_tpu.train.optim import adamw, sgd


def _run_pair(make_torch_opt, opt, steps, lr_of, beta1_of=None, wd=0.0):
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32)
             for _ in range(steps)]

    pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = make_torch_opt([pt])
    for t in range(steps):
        lr = lr_of(t)
        topt.param_groups[0]["lr"] = lr
        if beta1_of is not None:
            b2 = topt.param_groups[0]["betas"][1]
            topt.param_groups[0]["betas"] = (beta1_of(t), b2)
        pt.grad = torch.from_numpy(grads[t].copy())
        topt.step()
        topt.zero_grad()

    params = {"x": jnp.asarray(p0)}
    ostate = opt.init(params)
    for t in range(steps):
        b1 = beta1_of(t) if beta1_of is not None else 0.9
        params, ostate = opt.update({"x": jnp.asarray(grads[t])}, ostate,
                                    params, t, lr_of(t), b1)
    return pt.detach().numpy(), np.asarray(params["x"])


def test_adamw_matches_torch():
    want, got = _run_pair(
        lambda ps: torch.optim.AdamW(ps, lr=5e-4, weight_decay=0.0),
        adamw(weight_decay=0.0), steps=10, lr_of=lambda t: 5e-4)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def test_adamw_weight_decay_and_dynamic_beta1():
    beta1_of = lambda t: 0.95 - 0.01 * t  # OneCycle-style cycling
    want, got = _run_pair(
        lambda ps: torch.optim.AdamW(ps, lr=1e-3, weight_decay=0.05),
        adamw(weight_decay=0.05), steps=8,
        lr_of=lambda t: 1e-3 * (1 + 0.1 * t), beta1_of=beta1_of)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def test_sgd_nesterov_matches_torch():
    want, got = _run_pair(
        lambda ps: torch.optim.SGD(ps, lr=0.01, momentum=0.9,
                                   nesterov=True, weight_decay=1e-4),
        sgd(momentum=0.9, nesterov=True, weight_decay=1e-4),
        steps=10, lr_of=lambda t: 0.01)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)
