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


def test_hard_synthetic_tree(tmp_path):
    """hard=True writes the non-saturating task as an on-disk CamVid tree:
    32-class labels on disk (grouping still exercised), and the grouped
    12-class task has irreducible pixel-level error (color-only Bayes
    accuracy well below 1), so full-scale CLI trainings produce
    informative mIOU trajectories."""
    from pytorch_camvid_tpu.data.synthetic import color_bayes_accuracy

    root = str(tmp_path)
    write_synthetic_camvid(root, n_train=4, n_val=2, hw=(96, 128),
                           hard=True, hard_block=32)
    train = CamVid(root, image_set="train", image_size=(128, 96))
    assert train.labels.max() < 12
    # raw on-disk labels span the 32-class space (grouping LUT exercised)
    import cv2, os
    raw = cv2.imread(os.path.join(root, "camvid", "labels", "seq000_P.png"),
                     cv2.IMREAD_GRAYSCALE)
    assert raw.max() >= 12
    acc = color_bayes_accuracy(train.images, train.labels)
    assert 0.1 < acc < 0.9  # learnable but with irreducible color error


def test_hard_label_noise_ceiling():
    """label_noise flips ~p of blocks (labels only — the image keeps the
    true class's color/texture), and the analytic ceiling helper matches
    the empirical accuracy of the TRUE-class predictor on the noisy
    labels."""
    from pytorch_camvid_tpu.data.synthetic import (
        hard_synthetic_arrays, noisy_label_ceiling)

    p = 0.2
    img_c, lab_clean = hard_synthetic_arrays(8, (96, 128), seed=5)
    img_n, lab_noisy = hard_synthetic_arrays(8, (96, 128), seed=5,
                                             label_noise=p)
    np.testing.assert_array_equal(img_c, img_n)  # images unchanged
    # lab_clean IS the true-class plane; accuracy of predicting it
    emp_acc = float((lab_clean == lab_noisy).mean())
    acc_ceiling, miou_ceiling = noisy_label_ceiling(p)
    assert abs(emp_acc - acc_ceiling) < 0.02
    assert 0.6 < miou_ceiling < 0.75  # (1-p')/(1+p') with p'=11p/12
