"""Dress-rehearsal of docs/REPLAY.md (VERDICT r4 #4).

REPLAY.md is the runbook that will someday replay the reference's
published CamVid numbers (0.6296 UNet / 0.5913 SegNet,
/root/reference/README.md:35-40) when the real tarball is reachable.
Until this round its command sequence was prose that had never been
*executed*. This test runs the sequence end-to-end against a synthetic
``camvid.tgz`` fixture, exercising every stage the real replay will hit:

  1. the documented OFFLINE path — place camvid.tgz under the data root
     and run WITHOUT -download (the error message in
     data/camvid.py::_download documents exactly this drop-in),
  2. tarball extraction (data/camvid.py::_maybe_extract),
  3. packed-cache build from the extracted tree (32->12 grouping),
  4. `python train.py -net unet -b .. -e 2 -lr 5e-4 -wd 0 -data data`
     (the runbook §1 command with rehearsal-scale -b/-e/-image_size),
  5. `python eval.py -net unet -weight checkpoints/<run>/<best> -data
     data` (runbook §2) — Miou line parses,
  6. `python predict.py ... -img data/camvid/images/<name>` (runbook §2)
     — predict output written next to the source image.

Scaled-down knobs (batch 2, 2 epochs, 120x90, 8+4 images) keep this
runnable on the 1-core CPU tier; everything structural — tarball, split
rule via valid.txt, cache versioning, checkpoint layout, CLI surfaces —
is the real path at full scale.
"""

import os
import re
import subprocess
import sys
import tarfile
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow

_SITECUSTOMIZE = """\
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
"""


def _run(cmd, cwd, env, timeout=1800):
    # scripts live at the repo root; cwd is the rehearsal dir so the
    # cwd-relative checkpoints/ + predict outputs land there (reference
    # behavior)
    cmd = [os.path.join(REPO, cmd[0])] + cmd[1:]
    p = subprocess.run([sys.executable] + cmd, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert p.returncode == 0, (cmd, p.stdout[-3000:], p.stderr[-3000:])
    return p.stdout + p.stderr


def test_replay_runbook_sequence_executes():
    with tempfile.TemporaryDirectory() as td:
        # subprocess CPU-forcing shim (same pattern as the verify recipe)
        pp = os.path.join(td, "pp")
        os.makedirs(pp)
        with open(os.path.join(pp, "sitecustomize.py"), "w") as f:
            f.write(_SITECUSTOMIZE)
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env["PYTHONPATH"] = pp + os.pathsep + REPO

        # ---- fixture: a camvid.tgz with the fast.ai layout ----
        from pytorch_camvid_tpu.data.synthetic import write_synthetic_camvid
        stage = os.path.join(td, "stage")
        # 4+2 images: the flagship train step's XLA compile dominates the
        # 1-core wall time (~7-10 min); data volume is structural here
        write_synthetic_camvid(stage, n_train=4, n_val=2, hw=(120, 160),
                               structured=True)
        data_root = os.path.join(td, "data")
        os.makedirs(data_root)
        with tarfile.open(os.path.join(data_root, "camvid.tgz"), "w:gz") as t:
            t.add(os.path.join(stage, "camvid"), arcname="camvid")
        import shutil
        shutil.rmtree(stage)  # extraction must come from the tarball

        # ---- runbook §1: train (rehearsal scale) ----
        # runbook command: train.py -net unet -b 10 -e 120 -lr 5e-4 -wd 0
        #                  -data data [-download]
        # offline path: tarball already under data/, so no -download.
        out = _run(["train.py", "-net", "unet", "-b", "2", "-e", "2",
                    "-lr", "5e-4", "-wd", "0", "-data", data_root,
                    "-image_size", "120", "90", "-dp", "1", "-quiet"],
                   cwd=td, env=env)

        # the tarball was extracted and the packed cache built
        assert os.path.isdir(os.path.join(data_root, "camvid", "images"))
        caches = [f for f in os.listdir(os.path.join(data_root, "camvid"))
                  if f.endswith(".npz")]
        assert caches, "packed cache not built from the extracted tree"

        # checkpoint layout the runbook's §2 globs rely on:
        # checkpoints/<run>/<epoch>-{best,regular}.ckpt.npz (cwd-relative)
        ckpt_root = os.path.join(td, "checkpoints")
        runs = os.listdir(ckpt_root)
        assert len(runs) == 1, runs
        ckpts = sorted(os.listdir(os.path.join(ckpt_root, runs[0])))
        best = [c for c in ckpts if c.endswith("-best.ckpt.npz")]
        assert best, ckpts
        weight = os.path.join(ckpt_root, runs[0], best[-1])

        # ---- runbook §2: eval ----
        out = _run(["eval.py", "-net", "unet", "-weight", weight,
                    "-data", data_root, "-image_size", "120", "90",
                    "-b", "2"], cwd=td, env=env)
        m = re.search(r"miou[^\d]*([\d.]+)", out, re.IGNORECASE)
        assert m, out[-2000:]
        miou = float(m.group(1))
        assert 0.0 <= miou <= 1.0

        # ---- runbook §2: predict (reference parity: src.jpg/predict.jpg
        # in cwd, /root/reference/predict.py:49-56) ----
        img = os.path.join(data_root, "camvid", "images", "seq000.png")
        _run(["predict.py", "-net", "unet", "-weight", weight,
              "-img", img], cwd=td, env=env)
        for f in ("src.jpg", "predict.jpg", "predict_color.png"):
            assert os.path.exists(os.path.join(td, f)), os.listdir(td)
