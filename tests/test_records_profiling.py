"""Tests: record-store CamVid parity with the array-cache CamVid;
profiling helpers."""

import numpy as np

from pytorch_camvid_tpu.data.camvid import CamVid
from pytorch_camvid_tpu.data.camvid_records import CamVidRecords
from pytorch_camvid_tpu.data.synthetic import write_synthetic_camvid
from pytorch_camvid_tpu.utils.profiling import StepTimer, metrics_report


def test_camvid_records_matches_array_cache(tmp_path):
    root = str(tmp_path)
    write_synthetic_camvid(root, n_train=4, n_val=2, hw=(64, 96))

    arr = CamVid(root, image_set="train", image_size=None)
    rec = CamVidRecords(root, image_set="train")
    assert len(arr) == len(rec) == 4
    for i in range(4):
        ai, al = arr[i]
        ri, rl = rec[i]
        np.testing.assert_array_equal(ai, ri)  # PNG is lossless
        np.testing.assert_array_equal(al, rl)
    assert rec.class_num == 12 and rec.ignore_index == 11


def test_camvid_records_resize(tmp_path):
    root = str(tmp_path)
    write_synthetic_camvid(root, n_train=2, n_val=1, hw=(64, 96))
    rec = CamVidRecords(root, image_set="val", image_size=(48, 32))
    img, lab = rec[0]
    assert img.shape == (32, 48, 3) and lab.shape == (32, 48)


def test_step_timer_and_metrics_report():
    import jax.numpy as jnp
    t = StepTimer()
    for _ in range(3):
        t.start()
        x = jnp.ones((16, 16)) * 2
        t.stop(x)
    s = t.summary()
    assert s["steps"] == 3 and s["mean_ms"] > 0
    assert isinstance(metrics_report(), str)
