"""Global configuration (reference: conf/settings.py + conf/__init__.py).

The reference exposes module-level UPPERCASE constants copied onto a
``Settings`` singleton (conf/__init__.py:3-9). We keep the same attribute
surface (``settings.IMAGE_SIZE``, ``settings.MEAN`` ...) but back it with a
typed dataclass so runs can override values cleanly, and add TPU-specific
knobs (compute dtype, mesh shape) that have no reference equivalent.
"""

from __future__ import annotations

import dataclasses
from datetime import datetime
from typing import Tuple


@dataclasses.dataclass
class Settings:
    # CamVid per-channel mean/std in [0,1], **BGR order** to match the
    # reference's cv2 pipeline (conf/settings.py:7-9).
    MEAN: Tuple[float, float, float] = (
        0.42019099703461577, 0.41323568513979647, 0.4010048431259079)
    STD: Tuple[float, float, float] = (
        0.30598050258519743, 0.3089986932156864, 0.3054061869915674)

    # Pascal VOC2012 BGR stats (conf/settings.py:3-5, commented out there).
    VOC_MEAN: Tuple[float, float, float] = (
        0.40450239443559777, 0.4373051208637668, 0.45734658153594476)
    VOC_STD: Tuple[float, float, float] = (
        0.2846743681700796, 0.27163815793569834, 0.2747289066704502)

    CHECKPOINT_FOLDER: str = "checkpoints"
    LOG_FOLDER: str = "runs"

    # ISO timestamp naming run folders (conf/settings.py:14).
    TIME_NOW: str = dataclasses.field(
        default_factory=lambda: datetime.now().isoformat())

    # Save a "regular" checkpoint every SAVE_EPOCH epochs (conf/settings.py:17).
    SAVE_EPOCH: int = 10

    DATA_PATH: str = "data"

    # (W, H) in cv2 order (conf/settings.py:21); tensors are H=360, W=480.
    IMAGE_SIZE: Tuple[int, int] = (480, 360)

    MILESTONES: Tuple[int, ...] = (100, 150)

    IGNORE_LABEL: int = 255  # VOC ignore label (conf/settings.py:25)

    # ---- TPU-native knobs (no reference equivalent) ----
    # dtype used for conv/matmul compute; params are always float32.
    COMPUTE_DTYPE: str = "float32"
    # cross-replica BatchNorm statistics under data parallelism.
    SYNC_BN: bool = True
    # number of devices along the 'data' mesh axis (0 = all local devices).
    DATA_PARALLEL: int = 0

    @property
    def image_hw(self) -> Tuple[int, int]:
        """(H, W) tensor-order image size."""
        w, h = self.IMAGE_SIZE
        return (h, w)


# Singleton mirroring `from conf import settings` (conf/__init__.py:9).
settings = Settings()
