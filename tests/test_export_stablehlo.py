"""StableHLO serving export: serialize -> deserialize -> bit-equal outputs.

The reference ships no deployment-export surface (inference ends at
/root/reference/predict.py); tools/export_stablehlo.py is the TPU-native
production analogue: a self-contained StableHLO module with the weights
baked in, runnable on any PJRT runtime. These tests prove the roundtrip
on the CPU backend at a small working size."""

import os
import subprocess
import sys

import numpy as np
import pytest


def _tiny_predictor(batch=2, hw=(24, 32), net="unet"):
    import jax
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.serving import Predictor

    init_fn, _ = get_model(net, 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    return Predictor(net, variables, batch_size=batch, image_hw=hw)


def test_export_roundtrip_bit_equal(tmp_path):
    import jax
    from jax import export as jexport

    pred = _tiny_predictor()
    path = str(tmp_path / "unet.stablehlo")
    exp = pred.export_stablehlo(path)
    assert exp.in_avals[0].shape == (2, 24, 32, 3)

    with open(path, "rb") as f:
        reloaded = jexport.deserialize(f.read())
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (2, 24, 32, 3), dtype=np.uint8)
    got = np.asarray(jax.jit(reloaded.call)(images))
    want = pred.predict(images)
    assert got.dtype == np.uint8 and got.shape == (2, 24, 32)
    np.testing.assert_array_equal(got, want)


def test_export_forces_xla_pool(tmp_path, monkeypatch):
    """Export must trace the pure-XLA pool pair even when the environment
    selects the TPU Pallas pair (as a TPU host does by default): Mosaic
    pallas_calls are TPU-only custom calls — baking them in would break
    the any-PJRT-runtime artifact contract, and on this CPU backend would
    fail lowering outright (the regression this test pins)."""
    import jax
    from jax import export as jexport

    pred = _tiny_predictor(batch=1, hw=(32, 32), net="segnet")
    path = str(tmp_path / "segnet.stablehlo")
    monkeypatch.setenv("PCT_POOL_IMPL", "pallas_phase")
    exp = pred.export_stablehlo(path)
    monkeypatch.delenv("PCT_POOL_IMPL")
    # the env override is restored after tracing
    assert os.environ.get("PCT_POOL_IMPL") is None

    with open(path, "rb") as f:
        reloaded = jexport.deserialize(f.read())
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
    got = np.asarray(jax.jit(reloaded.call)(images))
    np.testing.assert_array_equal(got, pred.predict(images))


def test_predict_resize_is_chunked(tmp_path):
    """Non-working-size requests resize per chunk on device (bounded
    in-flight memory), and the result matches resizing up front."""
    import jax.numpy as jnp
    from pytorch_camvid_tpu.ops.resize import resize_bilinear_cv2

    pred = _tiny_predictor(batch=2, hw=(24, 32))
    rng = np.random.default_rng(2)
    images = rng.integers(0, 256, (5, 48, 64, 3), dtype=np.uint8)
    got = pred.predict(images)
    assert got.shape == (5, 24, 32)
    x = resize_bilinear_cv2(jnp.asarray(images, jnp.float32), (24, 32))
    pre = np.asarray(jnp.round(jnp.clip(x, 0, 255)), np.uint8)
    np.testing.assert_array_equal(got, pred.predict(pre))


def test_export_cli(tmp_path):
    import jax
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.train import TrainState, adamw
    from pytorch_camvid_tpu.train.checkpoint import save_checkpoint

    init_fn, _ = get_model("segnet", 3, 12)
    state = TrainState.create(init_fn(jax.random.PRNGKey(1)), adamw())
    ckpt = str(tmp_path / "ck" / "1-regular.ckpt.npz")
    save_checkpoint(ckpt, state)

    out = str(tmp_path / "segnet.stablehlo")
    (tmp_path / "sitecustomize.py").write_text(
        "import jax\njax.config.update('jax_platforms', 'cpu')\n")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PYTHONPATH=f"{tmp_path}:/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/export_stablehlo.py",
         "-weight", ckpt, "-net", "segnet", "-b", "1",
         "-image_size", "32", "24", "-out", out],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "roundtrip verified" in r.stdout
    assert os.path.getsize(out) > 1e6  # weights are baked in
