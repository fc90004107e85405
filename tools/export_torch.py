"""Export a framework checkpoint as a reference-compatible torch .pth.

The reverse interop direction: train on TPU here, then evaluate/fine-tune
with the ORIGINAL reference repo (whose eval.py/predict.py load
``torch.save(net.state_dict())`` files, /root/reference/train.py:234).
The exported state_dict loads strictly into the reference's own model
classes (verified by tests/test_weight_transfer.py, which executes the
reference forward with transferred weights).

Usage:
  python tools/export_torch.py -weight checkpoints/<run>/60-best.ckpt.npz \
      -net unet -out 60-best.pth
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-weight", type=str, required=True,
                    help="framework checkpoint (.ckpt.npz)")
    ap.add_argument("-net", type=str, default="unet",
                    help="network name (unet | segnet)")
    ap.add_argument("-out", type=str, required=True,
                    help="output .pth path")
    ap.add_argument("-num_classes", type=int, default=12)
    args = ap.parse_args()

    import jax
    import torch
    from pytorch_camvid_tpu.interop import state_dict_from_variables
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.train import TrainState, adamw
    from pytorch_camvid_tpu.train.checkpoint import load_checkpoint

    init_fn, _ = get_model(args.net, 3, args.num_classes)
    template = TrainState.create(init_fn(jax.random.PRNGKey(0)), adamw())
    state, meta = load_checkpoint(args.weight, template)
    sd = state_dict_from_variables(
        args.net, {"params": state.params, "state": state.bn_state})
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
               args.out)
    print(f"wrote {args.out} ({len(sd)} tensors, epoch "
          f"{meta.get('epoch', '?')}, miou {meta.get('miou', '?')}) — "
          f"loads strictly into the reference {args.net} class")


if __name__ == "__main__":
    main()
