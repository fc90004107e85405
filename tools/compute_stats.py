"""Dataset statistics CLI (reference: utils.compute_mean_and_std,
utils.py:50-93 — the helper that produced conf/settings.py MEAN/STD).

Usage: python tools/compute_stats.py -data data [-dataset camvid]
Prints per-channel BGR mean/std in [0,1] over the train split.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from pytorch_camvid_tpu.utils.stats import compute_mean_and_std  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-data", type=str, default="data")
    parser.add_argument("-dataset", type=str, default="camvid",
                        choices=["camvid", "voc2012"])
    args = parser.parse_args()

    if args.dataset == "camvid":
        from pytorch_camvid_tpu.data import CamVid
        ds = CamVid(args.data, image_set="train", image_size=None)
    else:
        from pytorch_camvid_tpu.data.voc2012 import VOC2012Aug
        ds = VOC2012Aug(args.data, image_set="train")

    mean, std = compute_mean_and_std(ds.images)
    print(f"MEAN = {tuple(mean)}")
    print(f"STD = {tuple(std)}")
