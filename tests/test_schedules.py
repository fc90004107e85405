"""Golden tests: pure-function schedules vs torch schedulers
(train.py:103-104, lr_scheduler/*, legacy/train_tpu.py:86-97)."""

import numpy as np
import torch
import torch.optim as optim

from pytorch_camvid_tpu.train.schedules import (
    onecycle_lr, onecycle_beta1, warmup_lr, multistep_lr,
    exponential_sweep_lr)


def test_onecycle_matches_torch_exactly():
    max_lr, steps_per_epoch, epochs = 5e-4, 7, 9
    total = steps_per_epoch * epochs
    p = torch.nn.Parameter(torch.zeros(1))
    opt = optim.AdamW([p], lr=max_lr)
    sched = optim.lr_scheduler.OneCycleLR(
        opt, max_lr=max_lr, steps_per_epoch=steps_per_epoch, epochs=epochs)
    lr_fn = onecycle_lr(max_lr, total)
    b1_fn = onecycle_beta1(total)
    for step in range(total):
        want_lr = opt.param_groups[0]["lr"]
        want_b1 = opt.param_groups[0]["betas"][0]
        np.testing.assert_allclose(float(lr_fn(step)), want_lr, rtol=1e-5,
                                   err_msg=f"lr at step {step}")
        np.testing.assert_allclose(float(b1_fn(step)), want_b1, rtol=1e-5,
                                   err_msg=f"beta1 at step {step}")
        opt.step()
        sched.step()


def test_warmup_matches_reference_formula():
    fn = warmup_lr(0.1, total_iters=50)
    for step in [0, 1, 25, 50, 60]:
        np.testing.assert_allclose(float(fn(step)),
                                   0.1 * step / (50 + 1e-8), rtol=1e-6)


def test_multistep():
    fn = multistep_lr(0.1, milestones=[100, 150], gamma=0.1)
    np.testing.assert_allclose(float(fn(0)), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(fn(99)), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(fn(100)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(fn(150)), 0.001, rtol=1e-5)


def test_exponential_sweep_matches_torch():
    # oracle: the reference formula (lr_scheduler/ExponentialLR.py:20-23)
    # under torch _LRScheduler semantics — the constructor step()s once
    p = torch.nn.Parameter(torch.zeros(1))
    opt = optim.SGD([p], lr=1e-7)
    num_iter = 10

    class TorchExp(optim.lr_scheduler._LRScheduler):
        def __init__(self, optimizer, end_lr, num_iter):
            self.end_lr, self.num_iter = end_lr, num_iter
            super().__init__(optimizer, -1)

        def get_lr(self):
            r = (self.last_epoch + 1) / self.num_iter
            return [b * (self.end_lr / b) ** r for b in self.base_lrs]

    sched = TorchExp(opt, end_lr=10.0, num_iter=num_iter)
    fn = exponential_sweep_lr(1e-7, 10.0, num_iter)
    for step in range(num_iter):
        np.testing.assert_allclose(float(fn(step)),
                                   opt.param_groups[0]["lr"], rtol=1e-4)
        opt.step(); sched.step()
