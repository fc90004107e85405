"""BASELINE config 5: VOC2012 21-class multi-chip data-parallel training
over the mesh — exercised end-to-end on the 8-virtual-device mesh with a
synthetic VOC-shaped on-disk tree."""

import numpy as np

from pytorch_camvid_tpu.data.voc2012 import VOC2012Aug
from pytorch_camvid_tpu.train.loop import TrainConfig, run_training
from tests.test_datasets_extra import _write_voc


def test_voc_dp_training(tmp_path):
    root = str(tmp_path)
    _write_voc(root, n_train=16, n_val=3)
    train = VOC2012Aug(root, "train", image_size=(64, 48))
    val = VOC2012Aug(root, "val", image_size=(64, 48))
    assert train.class_num == 21 and train.ignore_index == 255

    cfg = TrainConfig(net="unet", batch_size=16, lr=1e-3, epochs=1,
                      quiet=True, data_parallel=0,  # all 8 virtual devices
                      loss_ignore_index=255)        # letterbox pad excluded
    state, history = run_training(cfg, train, val)
    assert len(history) == 1
    assert np.isfinite(history[0]["miou"])
    assert int(state.step) == 1
