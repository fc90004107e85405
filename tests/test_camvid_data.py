"""Dataset tests: 32->12 grouping parity, split logic, cache behavior
(reference dataset/camvid.py)."""

import numpy as np

from pytorch_camvid_tpu.data.camvid import (
    CamVid, CAMVID_CLASS_NAMES, group_label_ids)
from pytorch_camvid_tpu.data.synthetic import (
    CAMVID_CODES_32, write_synthetic_camvid)


def _oracle_group_ids(label, codes, class_names, label_groups):
    # transcription of the reference boolean-mask remap
    # (dataset/camvid.py:138-159) as a test oracle
    label = label.copy()
    masks = [np.zeros(label.shape, dtype="bool") for _ in class_names]
    for cls_id_32, name_32 in enumerate(codes):
        cls_id_12 = class_names.index(label_groups[name_32])
        masks[cls_id_12] += label == cls_id_32
    for cls_id_12, mask in enumerate(masks):
        label[mask] = cls_id_12
    return label


def test_grouping_bit_for_bit():
    from pytorch_camvid_tpu.data.camvid import CAMVID_LABEL_GROUPS
    rng = np.random.default_rng(0)
    label = rng.integers(0, 32, size=(48, 64)).astype(np.uint8)
    got = group_label_ids(label, CAMVID_CODES_32)
    want = _oracle_group_ids(label, CAMVID_CODES_32, CAMVID_CLASS_NAMES,
                             CAMVID_LABEL_GROUPS)
    np.testing.assert_array_equal(got, want)
    assert got.max() < 12


def test_camvid_split_and_cache(tmp_path):
    root = str(tmp_path)
    write_synthetic_camvid(root, n_train=6, n_val=2, hw=(96, 128))

    train = CamVid(root, image_set="train", image_size=(64, 48))
    val = CamVid(root, image_set="val", image_size=(64, 48))
    assert len(train) == 6 and len(val) == 2
    assert train.class_num == 12 and train.ignore_index == 11
    assert train.images.shape == (6, 48, 64, 3)
    assert train.labels.shape == (6, 48, 64)
    assert train.labels.max() < 12
    # val files are exactly those in valid.txt
    assert set(val.names) == {"seq006.png", "seq007.png"}

    # cache round-trip: second construction loads identical arrays
    train2 = CamVid(root, image_set="train", image_size=(64, 48))
    np.testing.assert_array_equal(train.images, train2.images)
    np.testing.assert_array_equal(train.labels, train2.labels)

    # per-sample surface with paired transform (dataset/camvid.py:161-173)
    img, lab = train[0]
    assert img.shape == (48, 64, 3) and lab.shape == (48, 64)
