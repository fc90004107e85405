"""pytorch_camvid_tpu — a TPU-native (JAX/XLA/Pallas) semantic-segmentation framework.

A ground-up rebuild of the capabilities of weiaicunzai/pytorch-camvid
(reference at /root/reference) designed TPU-first:

- functional models (pure init/apply over parameter pytrees), NHWC layout,
  static shapes, everything jit-compiled,
- on-device batched augmentation (the whole CamVid dataset lives in HBM as
  uint8; no per-sample Python work on the hot path),
- data parallelism via ``jax.sharding.Mesh`` + jit/shard_map with XLA
  collectives over ICI (reference analogue: legacy/train_tpu.py torch_xla DP),
- on-device confusion-matrix metrics (reference analogue: legacy/metrics.py),
- pure-function LR schedules incl. an exact OneCycle reproduction
  (reference: torch.optim.lr_scheduler.OneCycleLR at train.py:103).
"""

__version__ = "0.1.0"

from pytorch_camvid_tpu.config import Settings, settings  # noqa: F401
