"""Data pipeline: host-side decode+cache, datasets, on-device augmentation."""

from pytorch_camvid_tpu.data.camvid import (  # noqa: F401
    CamVid, CAMVID_CLASS_NAMES, CAMVID_LABEL_GROUPS, group_label_ids)
from pytorch_camvid_tpu.data.voc2012 import (  # noqa: F401
    VOC2012Aug, VOC_CLASS_NAMES)
