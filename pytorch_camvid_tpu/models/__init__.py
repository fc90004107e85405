"""Segmentation models as pure (init, apply) function pairs over pytrees.

Reference models: models/unet.py (UNet, 34.5M params) and models/segnet.py
(SegNet, 29.4M params). ``get_model`` mirrors utils.get_model
(utils.py:147-160).
"""

from __future__ import annotations

from pytorch_camvid_tpu.models.unet import init_unet, apply_unet
from pytorch_camvid_tpu.models.segnet import init_segnet, apply_segnet


def get_model(model_name: str, input_channels: int, class_num: int):
    """Return (init_fn, apply_fn) for a model by name (utils.py:147-160).

    init_fn(key) -> variables = {'params': ..., 'state': ...}
    apply_fn(variables, x, train=..., axis_name=None, compute_dtype=...)
        -> (logits NHWC, new_state)
    """
    if model_name == "unet":
        return (lambda key, **kw: init_unet(key, input_channels, class_num, **kw),
                apply_unet)
    elif model_name == "segnet":
        return (lambda key, **kw: init_segnet(key, input_channels, class_num, **kw),
                apply_segnet)
    else:
        raise ValueError("network type does not supported")
