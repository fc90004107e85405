"""Synthetic CamVid-shaped fixtures for tests and data-free benchmarks.

The real dataset needs the fast.ai tarball (dataset/camvid.py:25-27), which a
zero-egress environment cannot fetch; SURVEY.md §4 calls for a synthetic
CamVid-shaped fixture (generated PNGs + codes.txt + valid.txt) exercising
extraction-skip, grouping, split and end-to-end training.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

# the 32 CamVid codes in their canonical codes.txt order
CAMVID_CODES_32 = [
    "Animal", "Archway", "Bicyclist", "Bridge", "Building", "Car",
    "CartLuggagePram", "Child", "Column_Pole", "Fence", "LaneMkgsDriv",
    "LaneMkgsNonDriv", "Misc_Text", "MotorcycleScooter", "OtherMoving",
    "ParkingBlock", "Pedestrian", "Road", "RoadShoulder", "Sidewalk",
    "SignSymbol", "Sky", "SUVPickupTruck", "TrafficCone", "TrafficLight",
    "Train", "Tree", "Truck_Bus", "Tunnel", "VegetationMisc", "Void", "Wall",
]


def synthetic_arrays(n: int, hw: Tuple[int, int] = (360, 480),
                     num_classes: int = 12, seed: int = 0):
    """Random (images NHWC uint8, labels NHW uint8) with blocky structure so
    a model can actually learn something (labels correlate with color)."""
    rng = np.random.default_rng(seed)
    h, w = hw
    labels = rng.integers(0, num_classes, size=(n, h // 40 + 1, w // 40 + 1),
                          dtype=np.uint8)
    labels = np.kron(labels, np.ones((40, 40), np.uint8))[:, :h, :w]
    base = (labels.astype(np.float32) * (255.0 / max(num_classes - 1, 1)))
    noise = rng.normal(0, 12, size=(n, h, w, 3)).astype(np.float32)
    images = np.clip(base[..., None] + noise, 0, 255).astype(np.uint8)
    return images, labels


def write_synthetic_voc(root: str, n_train: int = 3, n_val: int = 2,
                        seed: int = 0):
    """Write a miniature VOC2012-augmented on-disk tree (JPEGImages/,
    SegmentationClassAugRaw/, ImageSets/Segmentation/{trainaug,val}.txt)
    with varying image sizes, as the letterbox cache builder expects."""
    import cv2
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "SegmentationClassAugRaw"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Segmentation"),
                exist_ok=True)
    names = [f"2007_{i:06d}" for i in range(n_train + n_val)]
    for i, name in enumerate(names):
        h, w = (120 + 17 * (i % 4), 160 - 11 * (i % 4))  # varying sizes
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        lab = rng.integers(0, 21, size=(h, w), dtype=np.uint8)
        cv2.imwrite(os.path.join(root, "JPEGImages", name + ".jpg"), img)
        cv2.imwrite(os.path.join(root, "SegmentationClassAugRaw",
                                 name + ".png"), lab)
    with open(os.path.join(root, "ImageSets", "Segmentation",
                           "trainaug.txt"), "w") as f:
        f.write("\n".join(names[:n_train]) + "\n")
    with open(os.path.join(root, "ImageSets", "Segmentation",
                           "val.txt"), "w") as f:
        f.write("\n".join(names[n_train:]) + "\n")
    return names


def _structured_pair(rng, h: int, w: int, block: int = 40):
    """(image BGR uint8, label32 uint8) with learnable structure: blocky
    12-class regions, each pixel colored by a class-specific BGR base +
    noise, and the stored label a RANDOM 32-class member of the group — so
    training data exercises the 32->12 grouping LUT while the grouped task
    stays learnable (label correlates with color)."""
    from pytorch_camvid_tpu.data.camvid import (
        CAMVID_CLASS_NAMES, CAMVID_LABEL_GROUPS)
    members = [[i for i, c in enumerate(CAMVID_CODES_32)
                if CAMVID_LABEL_GROUPS[c] == g] for g in CAMVID_CLASS_NAMES]
    # 12 visually distinct BGR base colors (deterministic)
    palette = np.stack(np.meshgrid([40, 120, 215], [40, 120, 215],
                                   [40, 215])).reshape(3, -1).T[:12]
    lab12 = rng.integers(0, 12, size=(h // block + 1, w // block + 1),
                         dtype=np.uint8)
    lab12 = np.kron(lab12, np.ones((block, block), np.uint8))[:h, :w]
    img = palette[lab12].astype(np.float32)
    img += rng.normal(0, 25, size=img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    # per-image random group member for each of the 12 classes
    code_for = np.array([m[rng.integers(0, len(m))] for m in members],
                        np.uint8)
    return img, code_for[lab12]


def write_synthetic_camvid(root: str, n_train: int = 6, n_val: int = 2,
                           hw: Tuple[int, int] = (96, 128), seed: int = 0,
                           structured: bool = False):
    """Write a miniature on-disk CamVid tree (images/, labels/ with 32-class
    ids, codes.txt, valid.txt) under ``root/camvid``; returns the dir.

    structured=True writes learnable data (labels correlate with color) so
    real training runs show falling loss / rising mIOU; the default random
    data is enough for plumbing tests."""
    import cv2
    rng = np.random.default_rng(seed)
    d = os.path.join(root, "camvid")
    os.makedirs(os.path.join(d, "images"), exist_ok=True)
    os.makedirs(os.path.join(d, "labels"), exist_ok=True)
    h, w = hw
    names = []
    for i in range(n_train + n_val):
        name = f"seq{i:03d}.png"
        names.append(name)
        if structured:
            img, lab32 = _structured_pair(rng, h, w)
        else:
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            lab32 = rng.integers(0, len(CAMVID_CODES_32), size=(h, w),
                                 dtype=np.uint8)
        cv2.imwrite(os.path.join(d, "images", name), img)
        cv2.imwrite(os.path.join(d, "labels", name.replace(".", "_P.")),
                    lab32)
    with open(os.path.join(d, "codes.txt"), "w") as f:
        f.write("\n".join(CAMVID_CODES_32) + "\n")
    with open(os.path.join(d, "valid.txt"), "w") as f:
        f.write("\n".join(names[n_train:]) + "\n")
    return d
