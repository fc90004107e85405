"""Test harness: force the CPU XLA backend with 8 virtual devices so
data-parallel sharding is exercised without TPU hardware (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS=cpu from the environment; the
# config knob takes precedence.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---- two-tier suite (docs/TESTING.md; VERDICT r3 #4) ----
# default run = fast tier (target <20 min on the 1-core CI host);
# `-m slow` runs the long tier; `-m "slow or not slow"` runs everything.
# Files here are wholly slow (multi-process runs, torch-lockstep
# trajectories, Pallas interpret mode, CPU int8 convs); individual slow
# tests elsewhere carry @pytest.mark.slow in-file.
SLOW_FILES = {
    "test_multihost.py",        # real 2-process runs, ~25 min
    "test_convergence.py",      # multi-epoch training to a quality bar
    "test_trajectory_parity.py",  # 50-step lockstep vs torch
    "test_grad_parity.py",      # full-model VJPs vs torch autograd
    "test_pallas_conv_train.py",  # interpret-mode kernel oracles
    "test_pallas_conv_pair.py",
    "test_pallas_kernels.py",
    "test_export_stablehlo.py",  # serialize + deserialize + re-execute
    "test_round2_parity.py",
    "test_voc_dp.py",           # multi-epoch VOC DP training (~9 min)
    "test_replay_rehearsal.py",  # REPLAY.md runbook executed end-to-end
}


# Individual long tests moved to the slow tier to keep the fast tier
# under its 20-min budget (VERDICT r4 #6; measured ranking:
# run_artifacts/fast_tier_durations_r5.txt — these seven cost 719 s of
# the 30:03 total). Each keeps a faster sibling in the fast tier:
# elastic restore -> test_dp_train_step_matches_single_device + the
# driver dryrun phase 3; serve CLI e2e -> test_serving.py Predictor
# coverage; preempt resume -> test_checkpoint_roundtrip_step_exact;
# chained-dispatch loop surface -> test_dispatch_chain_matches_unchained;
# program dump in the loop -> test_dump_program_writes_stablehlo;
# saves-best history -> test_run_training_host_loader; remat A/B ->
# the remat config stays exercised by the b40 sweep artifact.
SLOW_TESTS = {
    "test_elastic_checkpoint_restore_across_mesh_shapes",   # 150s
    "test_serve_cli_end_to_end",                            # 110s
    "test_preempt_midepoch_resume_is_step_exact",           # 103s
    "test_dispatch_chain_run_training_surface",             # 97s
    "test_train_run_dumps_program",                         # 90s
    "test_run_training_saves_best_and_returns_history",     # 87s
    "test_remat_step_matches_plain",                        # 81s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (os.path.basename(str(item.fspath)) in SLOW_FILES
                or item.name.split("[")[0] in SLOW_TESTS):
            item.add_marker(pytest.mark.slow)


def pytest_report_header(config):
    """Make the default tier split VISIBLE (ADVICE r4 #4): a plain
    `pytest tests/` silently deselects the slow tier via pyproject's
    addopts, which would otherwise hide the multi-process / convergence /
    lockstep-parity coverage from anyone not reading docs/TESTING.md."""
    mark = config.getoption("-m")
    if mark == "not slow":
        return ("NOTE: fast tier only — the slow tier (multihost, "
                "convergence, torch-lockstep, Pallas interpret, export) is "
                "DESELECTED by pyproject addopts. Full coverage: "
                "pytest -m 'slow or not slow' (docs/TESTING.md).")
    return None
