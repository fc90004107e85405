"""Tests: model summary, dataset viz, numpy mean_iou parity, stats,
multi-slice mesh, NaN guard."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.models import get_model
from pytorch_camvid_tpu.utils.summary import (
    count_params, summarize_model)
from pytorch_camvid_tpu.utils.viz import colorize_mask, plot_dataset
from pytorch_camvid_tpu.utils.metrics_np import mean_iou
from pytorch_camvid_tpu.utils.stats import compute_mean_and_std


def test_summary_counts():
    init_fn, _ = get_model("unet", 3, 12)
    v = init_fn(jax.random.PRNGKey(0))
    text = summarize_model(v, "unet")
    assert f"{count_params(v['params']):,}" in text
    assert "down1" in text and "output" in text


def test_dump_program_writes_stablehlo(tmp_path):
    """dump_program (the visualize_network/add_graph analogue,
    utils.py:10-13) writes the jitted step's StableHLO module text."""
    from pytorch_camvid_tpu.utils.summary import dump_program

    init_fn, apply_fn = get_model("unet", 3, 12)
    v = init_fn(jax.random.PRNGKey(0), width_mult=0.125)
    f = jax.jit(lambda v, x: apply_fn(v, x, train=False)[0])
    x = jax.ShapeDtypeStruct((1, 48, 64, 3), jnp.float32)
    path = dump_program(f, (v, x), str(tmp_path / "program.stablehlo.txt"))
    text = open(path).read()
    assert "module" in text and "stablehlo" in text
    assert "convolution" in text  # the convs are in the dumped graph


def test_train_run_dumps_program(tmp_path, monkeypatch):
    """run_training writes program_<net>.stablehlo.txt into the run dir
    once per run (train.py:97-98 parity surface)."""
    import os
    from pytorch_camvid_tpu.data.synthetic import synthetic_arrays
    from pytorch_camvid_tpu.train.loop import run_training, TrainConfig
    from pytorch_camvid_tpu.utils import SummaryLogger

    class _DS:
        def __init__(self, n, seed=0):
            self.images, self.labels = synthetic_arrays(n, (48, 64), 12,
                                                        seed)
            self.class_num, self.ignore_index = 12, 11
            self.class_names = [str(i) for i in range(12)]

    monkeypatch.chdir(tmp_path)
    train_ds = _DS(4)
    val_ds = _DS(2, seed=1)
    log_dir = str(tmp_path / "runs")
    cfg = TrainConfig(net="unet", batch_size=2, lr=1e-3, epochs=1,
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      log_dir=log_dir, quiet=True, data_parallel=1)
    logger = SummaryLogger(log_dir)
    try:
        run_training(cfg, train_ds, val_ds, logger=logger)
    finally:
        logger.close()
    path = os.path.join(log_dir, "program_unet.stablehlo.txt")
    assert os.path.exists(path)
    assert "stablehlo" in open(path).read()


def test_colorize_and_plot(tmp_path):
    masks = np.random.default_rng(0).integers(
        0, 12, size=(4, 20, 30)).astype(np.uint8)
    imgs = np.random.default_rng(1).integers(
        0, 256, size=(4, 20, 30, 3)).astype(np.uint8)
    c = colorize_mask(masks[0])
    assert c.shape == (20, 30, 3)
    # sentinel labels render black
    m = masks[0].copy()
    m[0, 0] = 255
    assert (colorize_mask(m)[0, 0] == 0).all()
    out = plot_dataset(imgs, masks, str(tmp_path / "grid.png"), count=4)
    import os
    assert os.path.exists(out)


def test_mean_iou_np_matches_reference_semantics():
    rng = np.random.default_rng(2)
    preds = [rng.integers(0, 5, size=(8, 8)) for _ in range(3)]
    gts = [rng.integers(0, 5, size=(8, 8)) for _ in range(3)]
    all_acc, acc, iou = mean_iou(preds, gts, 5, ignore_index=4)
    assert 0 <= all_acc <= 1
    assert acc.shape == (5,) and iou.shape == (5,)
    # nan_to_num path (utils.py:225-227)
    _, acc2, iou2 = mean_iou(preds, gts, 5, 4, nan_to_num=0.0)
    assert not np.isnan(acc2).any() and not np.isnan(iou2).any()


def test_compute_mean_and_std():
    imgs = np.full((3, 4, 5, 3), 127, np.uint8)
    mean, std = compute_mean_and_std(imgs)
    np.testing.assert_allclose(mean, [127 / 255] * 3, rtol=1e-6)
    np.testing.assert_allclose(std, [0, 0, 0], atol=1e-9)


def test_multislice_mesh_dp():
    from pytorch_camvid_tpu.parallel.mesh import (
        make_multislice_mesh, batch_sharding, replicated_sharding)
    mesh = make_multislice_mesh(n_slice=2, n_data=4)
    assert mesh.shape == {"slice": 2, "data": 4, "model": 1}
    # a sharded mean over (slice, data) equals the global mean
    x = jnp.arange(32.0).reshape(8, 4)
    xs = jax.device_put(x, batch_sharding(mesh))
    got = jax.jit(lambda a: jnp.mean(a),
                  out_shardings=replicated_sharding(mesh))(xs)
    np.testing.assert_allclose(float(got), float(jnp.mean(x)), rtol=1e-6)


def test_nan_guard_trips():
    from pytorch_camvid_tpu.train.loop import TrainConfig, run_training
    from pytorch_camvid_tpu.data.synthetic import synthetic_arrays

    class DS:
        pass

    ds = DS()
    ds.images, ds.labels = synthetic_arrays(4, (32, 32), 12)
    ds.class_num, ds.ignore_index = 12, 11
    ds.class_names = [str(i) for i in range(12)]

    # loss is computed pre-update, so the NaN appears on the 2nd step
    cfg = TrainConfig(net="unet", batch_size=4, lr=1e20, epochs=2,
                      quiet=True, checkpoint_dir=None, data_parallel=1)
    with pytest.raises(FloatingPointError):
        run_training(cfg, ds, ds)


def test_bench_flop_model_and_shapes():
    """bench.py's analytic FLOP model and perf_probe's shape inventory stay
    consistent with the models (pure python, no device work)."""
    import bench
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from tools.perf_probe import unet_conv_shapes

    u = bench._conv_fwd_flops("unet")
    s = bench._conv_fwd_flops("segnet")
    # documented values (bench.py docstring / PERF.md)
    assert abs(u / 1e9 - 346.0) < 1.0, u
    assert abs(s / 1e9 - 212.8) < 1.0, s

    shapes = unet_conv_shapes()
    assert sum(shapes.values()) == 23  # 23 conv blocks in UNet
    # the probe inventory's flops agree with the bench model
    total = sum(2.0 * 9.0 * ci * co * h * w * mult
                for (h, w, ci, co), mult in shapes.items())
    assert abs(total - u) / u < 1e-6
