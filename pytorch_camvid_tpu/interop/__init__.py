"""Interop with the reference PyTorch implementation (weight transfer)."""

from pytorch_camvid_tpu.interop.torch_weights import (  # noqa: F401
    variables_from_state_dict, state_dict_from_variables,
    load_torch_checkpoint)
