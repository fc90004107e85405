"""Export a trained checkpoint as a self-contained StableHLO serving module.

The artifact bakes the weights in as constants and has the fixed serving
signature uint8 (B, H, W, 3) BGR -> uint8 (B, H, W) class map, with the
normalization and bf16 compute inside — deployable on any PJRT runtime
without Python model code (and loadable back into JAX via
``jax.export.deserialize`` for verification, which this tool does before
reporting success). The reference has no serving-export surface at all
(its inference story ends at /root/reference/predict.py); this is the
TPU-native production analogue.

Usage:
  python tools/export_stablehlo.py -weight checkpoints/<run>/60-best.ckpt.npz \
      -net unet -b 8 -out unet_serving.stablehlo [-platforms tpu,cpu]
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
                    help="checkpoint (.ckpt.npz or reference .pth)")
    ap.add_argument("-net", type=str, default="unet")
    ap.add_argument("-b", type=int, default=8, help="compiled batch size")
    ap.add_argument("-image_size", type=int, nargs=2, default=(480, 360),
                    metavar=("W", "H"),
                    help="working size, cv2 (W, H) order like the reference")
    ap.add_argument("-num_classes", type=int, default=12)
    ap.add_argument("-out", type=str, required=True)
    ap.add_argument("-platforms", type=str, default=None,
                    help="comma list, e.g. 'tpu,cpu' for a multi-platform "
                         "artifact (default: current backend only)")
    ap.add_argument("-no_verify", action="store_true",
                    help="skip the deserialize-and-compare pass (on a "
                         "remote-tunneled TPU it recompiles the whole "
                         "weight-baked module, ~3-4 min)")
    args = ap.parse_args()

    import numpy as np
    import jax
    from jax import export as jexport
    from pytorch_camvid_tpu.serving import Predictor

    w, h = args.image_size
    pred = Predictor.from_checkpoint(
        args.net, args.weight, batch_size=args.b, image_hw=(h, w),
        num_classes=args.num_classes)
    platforms = args.platforms.split(",") if args.platforms else None
    exp = pred.export_stablehlo(args.out, platforms=platforms)

    size_mb = os.path.getsize(args.out) / 1e6
    plats = ",".join(exp.platforms)
    line = (f"wrote {args.out} ({size_mb:.1f} MB, platforms [{plats}], "
            f"signature uint8[{args.b},{h},{w},3] -> uint8[{args.b},{h},{w}])")
    if args.no_verify:
        print(line)
        return

    # Roundtrip verification: deserialize the bytes we wrote and compare
    # against the live predictor on a random batch. Baking the weights as
    # constants lets XLA fold/fuse differently than the parameterized live
    # path, so in bf16 a small fraction of near-tie pixels (top-2 logit
    # gap < ~0.02, measured on chip: 0.16% on random input) may flip —
    # the check requires >=99% agreement, and exact agreement where the
    # backend is deterministic (CPU test: bit-equal).
    with open(args.out, "rb") as f:
        reloaded = jexport.deserialize(f.read())
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (args.b, h, w, 3), dtype=np.uint8)
    got = np.asarray(jax.jit(reloaded.call)(images))
    want = pred.predict(images)
    agree = float((got == want).mean())
    if agree < 0.99:
        raise SystemExit(f"roundtrip mismatch: deserialized module agrees "
                         f"on only {100 * agree:.2f}% of pixels")
    print(f"{line} — roundtrip verified against the live predictor "
          f"({100 * agree:.2f}% pixel agreement)")


if __name__ == "__main__":
    main()
