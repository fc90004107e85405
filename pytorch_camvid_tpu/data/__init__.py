"""Data pipeline: host-side decode+cache, datasets, on-device augmentation."""

from pytorch_camvid_tpu.data.camvid import (  # noqa: F401
    CamVid, CAMVID_CLASS_NAMES, CAMVID_LABEL_GROUPS, group_label_ids)
