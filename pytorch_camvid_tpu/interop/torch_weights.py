"""Reference-checkpoint weight transfer.

The reference saves ``torch.save(net.state_dict())`` (train.py:234). This
module maps those state_dicts onto our parameter pytrees (and back), so

- users migrating from the reference can load their trained ``.pth``
  checkpoints directly (``eval.py -weight model.pth`` works via
  load_torch_checkpoint), and
- tests can assert full-model forward equivalence under transferred
  weights — the strongest architecture-parity check.

Name mapping (reference module structure):
- UNet (models/unet.py): ``down{k}.{i}.conv.{0|1}.*`` for encoder stages,
  ``upsample{k}.conv.conv.{0|1}.*`` for the up-convs, ``up{k}.{i}.conv.*``
  for decoder stages, ``output.conv.*`` for the head — BasicConv2d wraps a
  Sequential(conv, bn, relu) under ``.conv``.
- SegNet (models/segnet.py): ``encoder{k}.{i}.conv.*`` / ``.bn.*`` and
  ``decoder{k}.{i}.*`` — BasicConv holds ``.conv``/``.bn`` attributes.

Conv kernels transpose between torch OIHW and our HWIO.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp


def _block_names(net: str, stage: str, i: int) -> Dict[str, str]:
    """torch parameter names for conv-block i of a stage."""
    if net == "unet":
        if stage.startswith("upsample"):
            base = f"{stage}.conv.conv"
        else:  # down*/up*/output: Sequential of BasicConv2d
            base = f"{stage}.{i}.conv" if not stage == "output" \
                else "output.conv"
        return {"w": f"{base}.0.weight", "b": f"{base}.0.bias",
                "scale": f"{base}.1.weight", "bias": f"{base}.1.bias",
                "mean": f"{base}.1.running_mean",
                "var": f"{base}.1.running_var"}
    elif net == "segnet":
        base = f"{stage}.{i}"
        return {"w": f"{base}.conv.weight", "b": f"{base}.conv.bias",
                "scale": f"{base}.bn.weight", "bias": f"{base}.bn.bias",
                "mean": f"{base}.bn.running_mean",
                "var": f"{base}.bn.running_var"}
    raise ValueError(net)


def variables_from_state_dict(net: str, state_dict, variables):
    """Fill a freshly-initialized variables pytree from a torch state_dict
    (values: numpy arrays or torch tensors)."""
    def arr(v):
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    params = {k: [dict(b) for b in v] for k, v in
              variables["params"].items()}
    state = {k: [dict(b) for b in v] for k, v in
             variables["state"].items()}
    for stage, blocks in params.items():
        for i, blk in enumerate(blocks):
            names = _block_names(net, stage, i)
            w = arr(state_dict[names["w"]])          # OIHW
            blk["w"] = jnp.asarray(w.transpose(2, 3, 1, 0))  # -> HWIO
            blk["b"] = jnp.asarray(arr(state_dict[names["b"]]))
            blk["scale"] = jnp.asarray(arr(state_dict[names["scale"]]))
            blk["bias"] = jnp.asarray(arr(state_dict[names["bias"]]))
            state[stage][i] = {
                "mean": jnp.asarray(arr(state_dict[names["mean"]])),
                "var": jnp.asarray(arr(state_dict[names["var"]])),
            }
    return {"params": params, "state": state}


def state_dict_from_variables(net: str, variables) -> Dict[str, np.ndarray]:
    """Export our pytree as a reference-named state_dict (numpy values)."""
    out: Dict[str, np.ndarray] = {}
    for stage, blocks in variables["params"].items():
        for i, blk in enumerate(blocks):
            names = _block_names(net, stage, i)
            out[names["w"]] = np.asarray(blk["w"]).transpose(3, 2, 0, 1)
            out[names["b"]] = np.asarray(blk["b"])
            out[names["scale"]] = np.asarray(blk["scale"])
            out[names["bias"]] = np.asarray(blk["bias"])
            st = variables["state"][stage][i]
            out[names["mean"]] = np.asarray(st["mean"])
            out[names["var"]] = np.asarray(st["var"])
            # torch BN also tracks num_batches_tracked; emit a scalar for
            # strict load_state_dict compatibility
            bn_prefix = names["mean"].rsplit(".", 1)[0]
            out[f"{bn_prefix}.num_batches_tracked"] = np.asarray(
                0, np.int64)
    return out


def load_torch_checkpoint(path: str, net: str, variables):
    """Load a reference ``.pth`` checkpoint file into a variables pytree."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return variables_from_state_dict(net, sd, variables)
