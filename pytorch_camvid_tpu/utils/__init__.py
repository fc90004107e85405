"""Shared utilities (reference: utils.py)."""

from pytorch_camvid_tpu.utils.metrics_np import (  # noqa: F401
    intersect_and_union, mean_iou)
from pytorch_camvid_tpu.utils.stats import compute_mean_and_std  # noqa: F401
from pytorch_camvid_tpu.utils.tb import SummaryLogger  # noqa: F401
