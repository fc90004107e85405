"""CamVid backed by the native record store (reference:
legacy/camvid_lmdb.py — same CamVid logic but with encoded PNGs packed into
per-split LMDB environments at first run, :202-213, then
``__getitem__`` = txn.get + cv2.imdecode, :183-200).

Here the per-split cache is our single-file mmap record store
(native/recordstore.cpp): records are PNG-encoded (image, label) pairs with
the 32->12 grouping already applied, so a training job opens the dataset
with one mmap and decodes on demand. For the TPU hot path the packed-array
CamVid (camvid.py) is preferred; this class exists for LMDB-style
capability parity and for hosts where the decoded array cache would not fit
in RAM."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from pytorch_camvid_tpu.data.camvid import (
    CAMVID_CLASS_NAMES, group_id_lut)
from pytorch_camvid_tpu.data.native import RecordStore

CACHE_VERSION = 1


class CamVidRecords:
    """CamVid over a record-store cache of encoded PNGs."""

    def __init__(self, root: str, image_set: str = "train", transforms=None,
                 image_size: Optional[Tuple[int, int]] = None):
        if image_set not in ("train", "val"):
            raise RuntimeError("image set should only be train or set")
        self._root = root
        self._image_set = image_set
        self.transforms = transforms
        self._image_size = image_size

        self.class_names = list(CAMVID_CLASS_NAMES)
        self.class_num = len(self.class_names)
        self.ignore_index = self.class_names.index("Void")

        path = os.path.join(
            root, "camvid",
            f"records_v{CACHE_VERSION}_{image_set}.cvrs")
        if not os.path.exists(path):
            self._build(path)
        self._store = RecordStore(path)
        assert len(self._store) % 2 == 0

    def _build(self, path: str):
        import cv2
        from pytorch_camvid_tpu.data.camvid import (
            list_split_files, label_path_for)
        d = os.path.join(self._root, "camvid")
        files, codes = list_split_files(d, self._image_set)
        lut = group_id_lut(codes)
        records = []
        for p in files:
            img = cv2.imread(p)
            lab = lut[cv2.imread(label_path_for(p), 0)]
            ok1, img_png = cv2.imencode(".png", img)
            ok2, lab_png = cv2.imencode(".png", lab)
            assert ok1 and ok2
            records.append(img_png.tobytes())
            records.append(lab_png.tobytes())
        # atomic: a crash mid-build must not leave a truncated cache that
        # os.path.exists() would then trust forever
        tmp = path + ".tmp"
        RecordStore.write(tmp, records)
        os.replace(tmp, path)

    def __len__(self):
        return len(self._store) // 2

    def __getitem__(self, index: int):
        import cv2
        img = cv2.imdecode(
            np.frombuffer(self._store[2 * index], np.uint8),
            cv2.IMREAD_COLOR)
        lab = cv2.imdecode(
            np.frombuffer(self._store[2 * index + 1], np.uint8),
            cv2.IMREAD_GRAYSCALE)
        if self._image_size is not None:
            img = cv2.resize(img, self._image_size)
            lab = cv2.resize(lab, self._image_size,
                             interpolation=cv2.INTER_NEAREST)
        if self.transforms:
            img, lab = self.transforms(img, lab)
        return img, lab
