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


def write_synthetic_camvid(root: str, n_train: int = 6, n_val: int = 2,
                           hw: Tuple[int, int] = (96, 128), seed: int = 0):
    """Write a miniature on-disk CamVid tree (images/, labels/ with 32-class
    ids, codes.txt, valid.txt) under ``root/camvid``; returns the dir."""
    import cv2
    rng = np.random.default_rng(seed)
    d = os.path.join(root, "camvid")
    os.makedirs(os.path.join(d, "images"), exist_ok=True)
    os.makedirs(os.path.join(d, "labels"), exist_ok=True)
    h, w = hw
    names = []
    for i in range(n_train + n_val):
        name = f"seq{i:02d}.png"
        names.append(name)
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
