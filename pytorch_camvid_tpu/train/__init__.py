"""Training core: pure-function schedules, jit-fused optimizers, train/eval
steps, checkpointing."""

from pytorch_camvid_tpu.train.schedules import (  # noqa: F401
    onecycle_lr, onecycle_beta1, warmup_lr, multistep_lr,
    exponential_sweep_lr, constant_lr)
from pytorch_camvid_tpu.train.optim import adamw, sgd  # noqa: F401
from pytorch_camvid_tpu.train.state import TrainState  # noqa: F401
from pytorch_camvid_tpu.train.steps import (  # noqa: F401
    make_train_step, make_eval_step)
