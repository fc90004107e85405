"""Tests: VOC2012Aug letterbox cache, segmentation_aug palette strip,
TableBorder pickle masks, legacy-style Metrics accumulator."""

import os
import pickle

import numpy as np
import cv2
from PIL import Image

from pytorch_camvid_tpu.data.voc2012 import VOC2012Aug
from pytorch_camvid_tpu.data.segmentation_aug import strip_palette
from pytorch_camvid_tpu.data.tableborder import TableBorder
from pytorch_camvid_tpu.utils.confusion import Metrics


from pytorch_camvid_tpu.data.synthetic import write_synthetic_voc as _write_voc


def test_voc2012_cache_and_splits(tmp_path):
    root = str(tmp_path)
    _write_voc(root)
    train = VOC2012Aug(root, "train", image_size=(96, 72))
    val = VOC2012Aug(root, "val", image_size=(96, 72))
    assert len(train) == 3 and len(val) == 2
    assert train.class_num == 21 and train.ignore_index == 255
    assert train.images.shape == (3, 72, 96, 3)
    # letterbox pad fills labels with 255
    assert (train.labels == 255).any()
    assert set(np.unique(train.labels)) <= set(range(21)) | {255}
    # cache round trip
    train2 = VOC2012Aug(root, "train", image_size=(96, 72))
    np.testing.assert_array_equal(train.images, train2.images)


def test_strip_palette(tmp_path):
    src = tmp_path / "SegmentationClassAug"
    dst = tmp_path / "SegmentationClassAugRaw"
    os.makedirs(src)
    lab = np.random.default_rng(1).integers(0, 21, size=(40, 50),
                                            dtype=np.uint8)
    im = Image.fromarray(lab, mode="P")
    im.putpalette([v for i in range(256) for v in (i, 0, 0)])
    im.save(src / "a.png")
    n = strip_palette(str(src), str(dst))
    assert n == 1
    out = np.array(Image.open(dst / "a.png"))
    np.testing.assert_array_equal(out, lab)


def test_tableborder(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "images"))
    os.makedirs(os.path.join(root, "labels"))
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(60, 80, 3), dtype=np.uint8)
    cv2.imwrite(os.path.join(root, "images", "t0.png"), img)
    rows = rng.integers(0, 2, size=(60, 80)).astype(np.uint8)
    cols = rng.integers(0, 2, size=(60, 80)).astype(np.uint8)
    with open(os.path.join(root, "labels", "t0.pkl"), "wb") as f:
        pickle.dump((rows, cols), f)

    ds = TableBorder(root)
    assert len(ds) == 1
    image, mask = ds[0]
    assert image.shape == (60, 80, 3)
    assert mask.shape == (60, 80, 2)
    np.testing.assert_array_equal(mask[..., 0], rows)
    np.testing.assert_array_equal(mask[..., 1], cols)


def test_metrics_class_matches_sklearn_style_oracle():
    rng = np.random.default_rng(3)
    m = Metrics(12, ignore_index=11)
    cm_oracle = np.zeros((12, 12))
    for _ in range(3):  # running accumulation over batches
        preds = rng.integers(0, 12, size=(2, 10, 10))
        gts = rng.integers(0, 12, size=(2, 10, 10))
        m.add(preds, gts)
        for p, l in zip(preds.ravel(), gts.ravel()):
            cm_oracle[l, p] += 1

    keep = list(range(11))
    diag = np.diag(cm_oracle)
    prec = (diag / cm_oracle.sum(axis=0))
    rec = (diag / cm_oracle.sum(axis=1))
    iou = diag / (cm_oracle.sum(0) + cm_oracle.sum(1) - diag)
    # the legacy class keeps ignored labels in the matrix but masks the
    # ignore class when reducing; ours drops them at accumulation. For
    # classes != ignore the only difference is predictions at ignored
    # pixels, which only affect column sums of kept classes:
    assert abs(m.recall() - np.nanmean(rec[keep])) < 1e-6
    # iou/precision agree when recomputed from our matrix
    got = m.iou(average=False)
    mm = m.matrix
    want = np.diag(mm) / (mm.sum(0) + mm.sum(1) - np.diag(mm))
    np.testing.assert_allclose(got, want[keep])
    m.clear_data()
    assert m.matrix.sum() == 0
