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


def _tiny_predictor(batch=2, hw=(24, 32)):
    import jax
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.serving import Predictor

    init_fn, _ = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    return Predictor("unet", variables, batch_size=batch, image_hw=hw)


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
