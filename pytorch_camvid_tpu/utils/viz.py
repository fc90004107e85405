"""Dataset / prediction visualization (reference: utils.plot_dataset at
utils.py:230-246 — dead code referencing undefined names; this is the
working equivalent)."""

from __future__ import annotations

from typing import Optional

import numpy as np

# BGR palette for up to 21 classes (CamVid uses the first 12)
_PALETTE = np.array([
    [255, 206, 128], [0, 0, 128], [192, 192, 192], [64, 64, 128],
    [64, 64, 0], [0, 128, 128], [128, 128, 192], [128, 64, 64],
    [128, 0, 64], [0, 64, 64], [192, 128, 0], [0, 0, 0],
    [128, 128, 0], [0, 128, 0], [128, 0, 128], [0, 0, 255],
    [255, 0, 0], [0, 255, 0], [255, 255, 0], [0, 255, 255],
    [255, 0, 255]], np.uint8)


def colorize_mask(mask: np.ndarray, num_classes: int = 12) -> np.ndarray:
    """(H, W) class indices -> (H, W, 3) BGR color image."""
    pal = _PALETTE[:num_classes]
    safe = np.clip(mask, 0, len(pal) - 1)  # palette has 21 entries max
    out = pal[safe]
    out[mask >= num_classes] = 0  # ignore/sentinel labels -> black
    return out


def plot_dataset(images: np.ndarray, masks: np.ndarray, out_path: str,
                 count: int = 9, num_classes: int = 12,
                 rng_seed: Optional[int] = 0) -> str:
    """Save a grid of (image | colorized mask) pairs for `count` random
    samples — the working version of utils.plot_dataset."""
    import cv2
    n = len(images)
    idx = (np.random.default_rng(rng_seed).permutation(n)[:count]
           if rng_seed is not None else np.arange(min(count, n)))
    rows = []
    for i in idx:
        pair = np.concatenate(
            [images[i], colorize_mask(masks[i], num_classes)], axis=1)
        rows.append(pair)
    grid = np.concatenate(rows, axis=0)
    cv2.imwrite(out_path, grid)
    return out_path
