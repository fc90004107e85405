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


def hard_synthetic_arrays(n: int, hw: Tuple[int, int] = (48, 64),
                          num_classes: int = 12, sigma: float = 60.0,
                          block: int = 16, texture_amp: float = 40.0,
                          seed: int = 0, label_noise: float = 0.0):
    """Non-saturating segmentation task with tunable Bayes error
    (VERDICT r2 missing #3: every prior quality fixture saturates at
    mIOU 1.0 and cannot rank recipes).

    Construction:
    - blocky ``num_classes``-class regions (``block``-px tiles);
    - pixel colors are class-conditional Gaussians whose centers are CLOSE
      relative to ``sigma`` — color alone has irreducible error (with the
      default spacing ~55 units and sigma 60, the color-only Bayes
      classifier sits around 45-55%% accuracy);
    - a class-dependent sinusoidal texture (orientation/frequency keyed to
      the class, amplitude ``texture_amp``) adds signal only SPATIAL
      context can read — so convnets beat the pixel bound and better
      recipes rank measurably higher instead of everything hitting 1.0.
    - ``label_noise`` flips each BLOCK's stored label (not its image) to a
      uniformly random class with that probability. At small scale the
      texture keeps the task non-saturating by itself, but at production
      scale (hundreds of full-res images) spatial context fully reads the
      deterministic textures and mIOU approaches 1.0 again — block-level
      label noise restores an ANALYTIC ceiling no model can exceed: with
      flip prob p and uniform flips, pred==true is still optimal, per-pixel
      accuracy tops out at 1 - p' (p' = p*(1 - 1/num_classes)) and mIOU at
      ~(1 - p')/(1 + p'), so a recipe's quality reads as its gap to the
      known ceiling.

    Returns (images NHWC uint8 BGR, labels NHW uint8).
    """
    rng = np.random.default_rng(seed)
    h, w = hw
    # 12 centers on a tight grid: neighbors ~55 units apart in one channel
    centers = np.stack(np.meshgrid([100, 155], [80, 135, 190], [90, 145]),
                       ).reshape(3, -1).T[:num_classes].astype(np.float32)
    true_blocks = rng.integers(0, num_classes,
                               size=(n, h // block + 1, w // block + 1),
                               dtype=np.uint8)
    labels = np.kron(true_blocks,
                     np.ones((block, block), np.uint8))[:, :h, :w]
    img = centers[labels]  # (n, h, w, 3) — image ALWAYS follows the true class
    # class-keyed texture: stripes whose angle/frequency identify the class
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    angles = np.pi * np.arange(num_classes) / num_classes
    freqs = 2.0 * np.pi * (0.15 + 0.04 * np.arange(num_classes))
    phase = (np.cos(angles)[labels] * xx + np.sin(angles)[labels] * yy)
    img += (texture_amp * np.sin(freqs[labels] * phase))[..., None]
    img += rng.normal(0, sigma, size=img.shape)
    if label_noise > 0.0:
        flip = rng.random(true_blocks.shape) < label_noise
        noisy = np.where(flip, rng.integers(0, num_classes,
                                            size=true_blocks.shape,
                                            dtype=np.uint8), true_blocks)
        labels = np.kron(noisy, np.ones((block, block),
                                        np.uint8))[:, :h, :w]
    return np.clip(img, 0, 255).astype(np.uint8), labels


def noisy_label_ceiling(p: float, num_classes: int = 12):
    """(accuracy, mIOU) ceiling of ANY model on a hard_synthetic_arrays
    task with block label_noise=p: uniform flips keep pred==true optimal,
    so with balanced classes TP_i = (1-p')n_i and union_i = (1+p')n_i
    where p' = p*(1 - 1/num_classes)."""
    pp = p * (1.0 - 1.0 / num_classes)
    return 1.0 - pp, (1.0 - pp) / (1.0 + pp)


def color_bayes_accuracy(images: np.ndarray, labels: np.ndarray,
                         num_classes: int = 12) -> float:
    """Accuracy of the color-only Bayes classifier (nearest class-mean
    color) on a hard_synthetic_arrays set — the pixel-level bound a
    context-free model cannot beat; reported in artifacts so 'mIOU 0.7'
    rows read against the task's actual ceiling and floor."""
    x = images.reshape(-1, 3).astype(np.float32)
    y = labels.reshape(-1)
    means = np.stack([x[y == c].mean(axis=0) if (y == c).any()
                      else np.full(3, np.inf) for c in range(num_classes)])
    d = ((x[:, None, :] - means[None]) ** 2).sum(-1)
    return float((d.argmin(1) == y).mean())


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


def _group_members():
    """For each of the 12 grouped classes, the 32-class member code ids."""
    from pytorch_camvid_tpu.data.camvid import (
        CAMVID_CLASS_NAMES, CAMVID_LABEL_GROUPS)
    return [[i for i, c in enumerate(CAMVID_CODES_32)
             if CAMVID_LABEL_GROUPS[c] == g] for g in CAMVID_CLASS_NAMES]


def _lab12_to_lab32(rng, lab12: np.ndarray) -> np.ndarray:
    """Map a 12-class label plane to a random 32-class member per class —
    so on-disk fixtures exercise the 32->12 grouping LUT."""
    members = _group_members()
    code_for = np.array([m[rng.integers(0, len(m))] for m in members],
                        np.uint8)
    return code_for[lab12]


def _structured_pair(rng, h: int, w: int, block: int = 40):
    """(image BGR uint8, label32 uint8) with learnable structure: blocky
    12-class regions, each pixel colored by a class-specific BGR base +
    noise, and the stored label a RANDOM 32-class member of the group — so
    training data exercises the 32->12 grouping LUT while the grouped task
    stays learnable (label correlates with color)."""
    members = _group_members()
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
    return img, _lab12_to_lab32(rng, lab12)


def write_synthetic_camvid(root: str, n_train: int = 6, n_val: int = 2,
                           hw: Tuple[int, int] = (96, 128), seed: int = 0,
                           structured: bool = False, hard: bool = False,
                           hard_block: int = 40,
                           hard_label_noise: float = 0.0):
    """Write a miniature on-disk CamVid tree (images/, labels/ with 32-class
    ids, codes.txt, valid.txt) under ``root/camvid``; returns the dir.

    structured=True writes learnable data (labels correlate with color) so
    real training runs show falling loss / rising mIOU; the default random
    data is enough for plumbing tests. hard=True instead writes the
    NON-saturating task (``hard_synthetic_arrays``: class-conditional
    Gaussian colors with irreducible pixel-level error + class-keyed
    textures only spatial context can read) so full-scale training runs
    produce informative trajectories instead of hitting mIOU 1.0
    (VERDICT r2 missing #3, here as an on-disk tree the production CLIs
    can train on end-to-end)."""
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
        if hard:
            imgs, lab12 = hard_synthetic_arrays(
                1, hw, block=hard_block, seed=seed * 100003 + i,
                label_noise=hard_label_noise)
            img, lab32 = imgs[0], _lab12_to_lab32(rng, lab12[0])
        elif structured:
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
