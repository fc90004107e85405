"""serve.py CLI: batch folder inference through serving.Predictor.

The reference's inference surface is single-image predict.py
(/root/reference/predict.py); serve.py is the batch/production
counterpart. This drives it as a real subprocess on the CPU backend:
checkpoint -> folder of images -> per-image mask PNGs (+ colorized)."""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_serve_cli_end_to_end(tmp_path):
    import jax
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.train import TrainState, adamw
    from pytorch_camvid_tpu.train.checkpoint import save_checkpoint

    init_fn, _ = get_model("unet", 3, 12)
    state = TrainState.create(init_fn(jax.random.PRNGKey(0)), adamw())
    ckpt = str(tmp_path / "ck" / "1-regular.ckpt.npz")
    save_checkpoint(ckpt, state)

    rng = np.random.default_rng(3)
    src = tmp_path / "imgs"
    src.mkdir()
    # mixed sizes: serve.py resizes ragged inputs per image (padding into
    # one canvas would misalign smaller images' masks with their content)
    for name, hw in [("a", (60, 88)), ("b", (48, 72)), ("c", (60, 88))]:
        cv2.imwrite(str(src / f"{name}.png"),
                    rng.integers(0, 255, hw + (3,), np.uint8))

    out = tmp_path / "masks"
    (tmp_path / "sitecustomize.py").write_text(
        "import jax\njax.config.update('jax_platforms', 'cpu')\n")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PYTHONPATH=f"{tmp_path}:/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/serve.py", "-weight", ckpt,
         "-input", str(src), "-output", str(out), "-b", "2", "-color"],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "served 3 images" in r.stdout

    for name in ("a", "b", "c"):
        m = cv2.imread(str(out / f"{name}_mask.png"),
                       cv2.IMREAD_GRAYSCALE)
        assert m is not None and m.max() < 12  # class indices
        assert m.shape == (360, 480)           # the working size
        c = cv2.imread(str(out / f"{name}_color.png"))
        assert c is not None and c.shape == (360, 480, 3)

    # Geometric alignment: the odd-sized image's mask must match what a
    # single-image (no ragged branch, device-resize path) run produces —
    # ragged handling must not shift content. cv2's host resize and the
    # device resize are oracle-matched (tests/test_resize.py), so the two
    # paths may only disagree on near-tie argmax pixels.
    out_b = tmp_path / "mask_b_alone"
    r = subprocess.run(
        [sys.executable, "/root/repo/serve.py", "-weight", ckpt,
         "-input", str(src / "b.png"), "-output", str(out_b), "-b", "2"],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    m_folder = cv2.imread(str(out / "b_mask.png"), cv2.IMREAD_GRAYSCALE)
    m_alone = cv2.imread(str(out_b / "b_mask.png"), cv2.IMREAD_GRAYSCALE)
    agree = float((m_folder == m_alone).mean())
    assert agree >= 0.99, f"ragged-folder mask misaligned: {agree:.3f}"
