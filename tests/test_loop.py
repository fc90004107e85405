"""Library train/eval loop: end-to-end run with checkpoint cadence and
ragged-final-batch evaluation (train.py:116-240 behaviors)."""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.data.synthetic import synthetic_arrays
from pytorch_camvid_tpu.models import get_model
from pytorch_camvid_tpu.ops.metrics import confusion_matrix
from pytorch_camvid_tpu.train import TrainState, adamw, make_eval_step
from pytorch_camvid_tpu.train.loop import (
    TrainConfig, run_training, evaluate)
from pytorch_camvid_tpu.data.pipeline import DeviceDataLoader
from pytorch_camvid_tpu.data.augment import make_eval_normalize


class _DS:
    def __init__(self, n, hw=(32, 32), seed=0):
        self.images, self.labels = synthetic_arrays(n, hw, 12, seed)
        self.class_num, self.ignore_index = 12, 11
        self.class_names = [str(i) for i in range(12)]


def test_run_training_saves_best_and_returns_history(tmp_path):
    train_ds, val_ds = _DS(8), _DS(4, seed=1)
    ckpt = str(tmp_path / "checkpoints" / "run1")
    cfg = TrainConfig(net="unet", batch_size=4, lr=1e-3, epochs=2,
                      quiet=True, checkpoint_dir=ckpt, data_parallel=1,
                      save_epoch=1)
    state, history = run_training(cfg, train_ds, val_ds)
    assert [h["epoch"] for h in history] == [1, 2]
    assert int(state.step) == 4  # 2 epochs x 2 steps (drop_last batching)
    files = sorted(os.path.basename(p)
                   for p in glob.glob(os.path.join(ckpt, "*")))
    # epoch1: not past e//2 -> regular; epoch2: best (cadence quirk kept:
    # best save skips the regular save via continue, train.py:232-240)
    assert files == ["1-regular.ckpt.npz", "2-best.ckpt.npz"]


def test_evaluate_pads_ragged_final_batch():
    ds = _DS(5, seed=2)  # 5 images, batch 4 -> 4 + ragged 1
    init_fn, apply_fn = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    state = TrainState.create(variables, adamw())

    eval_fn = jax.jit(make_eval_step(apply_fn, 12, ignore_index=11,
                                     loss_ignore_index=255))
    loader = DeviceDataLoader(ds.images, ds.labels, 4)
    normalize = make_eval_normalize((0.4,) * 3, (0.3,) * 3)
    _, cm, n_batches = evaluate(state, eval_fn, loader, normalize, 4)
    assert n_batches == 2  # 4 + ragged 1 (reference eval.py:68 denominator)

    # direct single-pass oracle over all 5 images
    x = normalize(jnp.asarray(ds.images))
    logits, _ = apply_fn(variables, x, train=False)
    preds = jnp.argmax(logits, axis=-1)
    want = np.asarray(confusion_matrix(preds, jnp.asarray(ds.labels, jnp.int32),
                                       12, ignore_index=11))
    np.testing.assert_allclose(np.asarray(cm), want)


def test_run_training_host_loader():
    """-loader host: host-RAM arrays + native threaded gather + double-
    buffered H2D produce the same training surface as the device loader."""
    from pytorch_camvid_tpu.train.loop import TrainConfig, run_training

    ds = _DS(6, seed=3)
    cfg = TrainConfig(net="unet", batch_size=4, lr=1e-3, epochs=1,
                      quiet=True, data_parallel=2, loader="host")
    state, history = run_training(cfg, ds, _DS(3, seed=4))
    assert len(history) == 1
    assert np.isfinite(history[0]["miou"])
    assert int(state.step) == 1  # 6 imgs, batch 4, drop_last -> 1 step


def test_host_loader_drop_last_and_gather():
    from pytorch_camvid_tpu.data.pipeline import HostLoader
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (7, 8, 8, 3), np.uint8)
    labs = rng.integers(0, 12, (7, 8, 8), np.uint8)
    ld = HostLoader(imgs, labs, 3, shuffle=True, seed=5, drop_last=True)
    assert len(ld) == 2
    batches = list(ld.epoch(0))
    assert len(batches) == 2 and batches[0][0].shape == (3, 8, 8, 3)
    # gathered contents match a numpy take over the same permutation
    perm = np.random.default_rng(5 + 0).permutation(7)
    np.testing.assert_array_equal(np.asarray(batches[0][0]),
                                  imgs[perm[:3]])
    np.testing.assert_array_equal(np.asarray(batches[1][1]),
                                  labs[perm[3:6]])
