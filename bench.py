"""Benchmark harness: CamVid 360x480 train images/sec/chip + MFU.

Prints ONE JSON line. Primary metric (the BASELINE.json north-star) is the
UNet train throughput; the same line carries ``mfu`` and an ``extra`` dict
with the SegNet train row and the forward-only serving row so every headline
number is machine-recorded, not README prose (VERDICT.md round-1 weak #1).

The reference never published throughput (its benchmark.py measures only the
Python data pipeline; epoch times were printed, not recorded — BASELINE.md).
``vs_baseline`` is therefore computed against an analytic P100 estimate:

  UNet forward at 360x480 is ~346 GFLOP/image (2*9*cin*cout*H*W summed over
  all 23 conv blocks); training ~= 3x forward = ~1.04 TFLOP/image. A P100
  (9.3 TFLOPS fp32 peak) running cuDNN convs at a generous 40% utilization
  sustains ~3.7 TFLOPS -> ~3.6 images/sec. BASELINE.json's target is >=5x
  that, i.e. >= ~18 images/sec/chip.

MFU here is conservative: FLOPs counted are the *useful model* FLOPs
(analytic conv FLOPs of the forward, x3 for training), NOT whatever XLA
executes (which includes augmentation, BN, optimizer and any padding), so
MFU = useful_flops * images_per_sec / peak_flops understates utilization.
Peak is looked up from the device kind (bf16).

Measured path: batch gather from HBM-resident uint8 data + on-device
augmentation + forward + backward + OneCycle schedule + AdamW update, all
one jit-fused XLA program per step, bfloat16 compute. >=100 steady-state
steps after warmup (VERDICT.md round-1 asked for longer than 20).
"""

from __future__ import annotations

import json
import time

import numpy as np

P100_IMAGES_PER_SEC_EST = 3.6  # see module docstring


def _bf16_peak_flops(device):
    """Peak bf16 FLOP/s by device kind (public TPU specs). Returns None for
    unrecognized kinds (e.g. CPU) — MFU against a guessed peak is
    meaningless, so callers emit mfu=null instead (ADVICE r2)."""
    kind = getattr(device, "device_kind", "").lower()
    table = [
        ("v5 lite", 197e12), ("v5e", 197e12),
        ("v6 lite", 918e12), ("v6e", 918e12),
        ("v5p", 459e12), ("v5", 459e12),
        ("v4", 275e12), ("v3", 123e12), ("v2", 45e12),
    ]
    for sub, peak in table:
        if sub in kind:
            return peak
    return None


def _mfu(ips: float, flops_per_image: float, peak) -> float:
    return None if peak is None else round(ips * flops_per_image / peak, 4)


def _conv_fwd_flops(net: str, hw=(360, 480), num_classes: int = 12) -> float:
    """Analytic forward conv FLOPs/image: 2*9*cin*cout*h*w per conv block,
    walking the stage specs at their actual spatial dims (pool = floor/2,
    upsample = 2x then pad to the skip's size)."""
    h, w = hw
    total = 0.0

    def conv(cin, cout, hh, ww):
        return 2.0 * 9.0 * cin * cout * hh * ww

    if net == "unet":
        from pytorch_camvid_tpu.models.unet import _unet_spec
        spec = dict(_unet_spec(3, num_classes))
        dims = [(h, w)]
        for _ in range(4):
            dims.append((dims[-1][0] // 2, dims[-1][1] // 2))
        for i in range(5):  # encoder
            for cin, cout in spec[f"down{i + 1}"]:
                total += conv(cin, cout, *dims[i])
        for i, d in zip(range(1, 5), (3, 2, 1, 0)):  # decoder at skip dims
            up_h = dims[d + 1][0] * 2  # post-upsample, pre-pad
            up_w = dims[d + 1][1] * 2
            for cin, cout in spec[f"upsample{i}"]:
                total += conv(cin, cout, up_h, up_w)
            for cin, cout in spec[f"up{i}"]:
                total += conv(cin, cout, *dims[d])
        for cin, cout in spec["output"]:
            total += conv(cin, cout, h, w)
    elif net == "segnet":
        from pytorch_camvid_tpu.models.segnet import _segnet_spec
        spec = dict(_segnet_spec(3, num_classes))
        dims = [(h, w)]
        for _ in range(4):
            dims.append((dims[-1][0] // 2, dims[-1][1] // 2))
        for i in range(5):
            for cin, cout in spec[f"encoder{i + 1}"]:
                total += conv(cin, cout, *dims[i])
        # decoder i runs at the unpooled (encoder i's input) resolution
        for i in range(5, 0, -1):
            for cin, cout in spec[f"decoder{i}"]:
                total += conv(cin, cout, *dims[i - 1])
    else:
        raise ValueError(net)
    return total


def measure_train(net: str = "unet", batch_size: int = 24, steps: int = 100,
                  warmup: int = 5, hw=(360, 480),
                  remat: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    from pytorch_camvid_tpu.config import settings
    from pytorch_camvid_tpu.data.augment import (
        AugmentConfig, make_train_augment)
    from pytorch_camvid_tpu.data.synthetic import synthetic_arrays
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.train import (
        TrainState, adamw, make_train_step, onecycle_lr, onecycle_beta1)

    # dataset resident in HBM as uint8 (the TPU-native input pipeline)
    n_data = max(4 * batch_size, 64)
    images, labels = synthetic_arrays(n_data, hw=hw)
    d_images = jnp.asarray(images)
    d_labels = jnp.asarray(labels)

    init_fn, apply_fn = get_model(net, 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    opt = adamw(weight_decay=0.0)
    cfg = AugmentConfig(mean=settings.MEAN, std=settings.STD,
                        rotation_fill=11, scale_fill=11)
    augment = make_train_augment(cfg, compute_dtype=jnp.bfloat16)

    total = steps + warmup + 1
    step = make_train_step(apply_fn, opt, onecycle_lr(5e-4, total),
                           onecycle_beta1(total), augment_fn=augment,
                           compute_dtype=jnp.bfloat16, log_grad_norms=False,
                           remat=remat)

    # fold the batch gather into the jitted step: one XLA program per step
    def fused(state, data_i, data_l, idx):
        batch = (jnp.take(data_i, idx, axis=0), jnp.take(data_l, idx, axis=0))
        return step(state, batch)

    fused = jax.jit(fused, donate_argnums=(0,))
    state = TrainState.create(variables, opt)

    # batch indices follow the real loader's contract (DeviceDataLoader):
    # a fresh host-side epoch permutation, consumed without replacement —
    # so the measured path pays the same per-epoch bookkeeping train.py does
    rng = np.random.default_rng(0)
    pos = [0, rng.permutation(n_data)]  # cursor, current permutation

    def idx():
        lo, perm = pos
        if lo + batch_size > len(perm):  # drop_last, like the train loader
            perm = rng.permutation(n_data)
            lo = 0
        pos[0], pos[1] = lo + batch_size, perm
        return jnp.asarray(perm[lo: lo + batch_size])

    for _ in range(warmup):
        state, metrics = fused(state, d_images, d_labels, idx())
    float(metrics["loss"])  # full host sync (block_until_ready is
    # unreliable through the axon device tunnel)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = fused(state, d_images, d_labels, idx())
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    ips = batch_size * steps / dt
    flops_per_image = 3.0 * _conv_fwd_flops(net, hw)  # fwd + ~2x bwd
    peak = _bf16_peak_flops(jax.devices()[0])
    return {
        "images_per_sec": round(ips, 2),
        "mfu": _mfu(ips, flops_per_image, peak),
        "step_ms": round(1000.0 * dt / steps, 2),
        "batch_size": batch_size,
        "train_tflop_per_image": round(flops_per_image / 1e12, 4),
    }


def _d2h_floor_ms(shape, reps: int = 3) -> float:
    """Sustained device->host time for a FRESH uint8 array of ``shape``.

    The serving end-to-end number is D2H-bandwidth-bound through the axon
    tunnel, and the tunnel's bandwidth is NONSTATIONARY (measured 232 ms to
    696 ms for the same 4.15 MB transfer within one session —
    run_artifacts/serving_decomp*.jsonl). Recording the floor measured in
    the SAME run lets round-over-round comparisons separate tunnel weather
    from real regressions (the r2->r3 'drop' 73.0 -> 57.1 img/s was
    weather: interleaved A/B of the two serving pipelines shows no code
    regression). Fresh array per rep — jax caches an array's host copy
    after its first np.asarray, so re-fetching the same array measures
    nothing."""
    import jax
    import jax.numpy as jnp

    g = jax.jit(lambda x, s: x + s)
    base = jnp.zeros(shape, jnp.uint8)
    _ = np.asarray(g(base, np.uint8(0)))  # compile + first (outlier) fetch
    ts = []
    for i in range(reps):
        d = g(base, np.uint8(i + 1))
        t0 = time.perf_counter()
        _ = np.asarray(d)
        ts.append(time.perf_counter() - t0)
    return 1000.0 * float(np.median(ts))


def _h2d_floor_ms(shape, reps: int = 3) -> float:
    """Sustained host->device time for a FRESH uint8 array of ``shape`` —
    the input-side twin of _d2h_floor_ms (same tunnel-weather rationale).
    Fresh host array per rep; a trailing scalar fetch fences the transfer
    (device_put returns before the bytes land)."""
    import jax
    import jax.numpy as jnp

    g = jax.jit(lambda x: x.ravel()[0].astype(jnp.int32) + 1)
    host = np.zeros(shape, np.uint8)
    d = jax.device_put(host)
    _ = int(g(d))  # compile
    ts = []
    for i in range(reps):
        host = np.full(shape, i + 1, np.uint8)
        t0 = time.perf_counter()
        d = jax.device_put(host)
        _ = int(g(d))
        ts.append(time.perf_counter() - t0)
    return 1000.0 * float(np.median(ts))


def measure_serving(net: str = "unet", batch_size: int = 24,
                    n_images: int = 240, hw=(360, 480)) -> dict:
    import jax
    from pytorch_camvid_tpu.data.synthetic import synthetic_arrays
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.serving import Predictor

    import jax.numpy as jnp
    images, _ = synthetic_arrays(n_images, hw=hw, seed=3)
    init_fn, apply_fn = get_model(net, 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    p = Predictor(net, variables, batch_size=batch_size, image_hw=hw)
    p.predict(images[: 2 * batch_size])  # compile + warm
    t0 = time.perf_counter()
    out = p.predict(images)
    dt = time.perf_counter() - t0
    assert out.shape == (n_images, hw[0], hw[1])
    ips = n_images / dt

    # tunnel weather, measured in the same run: D2H floor for one chunk's
    # nibble-packed class-map batch (what predict() actually transfers)
    floor_ms = _d2h_floor_ms((batch_size, hw[0], hw[1] // 2))
    # H2D floor measured HERE, bracketed with the D2H floor right after
    # the e2e run it normalizes: the tunnel drifts 3-5x within a session,
    # so floors sampled minutes later make e2e_over_predicted weather
    # noise rather than a pipeline indicator
    h2d_floor = _h2d_floor_ms((batch_size, hw[0], hw[1], 3))
    d2h_bound_ips = batch_size / (floor_ms / 1000.0)
    # ...and the second weather dimension: per-dispatch round-trip
    # latency. At bad weather the tunnel's RPC latency (not its D2H
    # bandwidth) caps the pipeline — a chunk costs ~3 round-trips (H2D,
    # dispatch, D2H) — so both floors are recorded for normalization.
    import jax.numpy as _jnp
    _g = jax.jit(lambda s: s + 1)
    _ = int(_g(_jnp.int32(0)))
    _t0 = time.perf_counter()
    for _i in range(10):
        _ = int(_g(_jnp.int32(_i)))
    rtt_ms = 100.0 * (time.perf_counter() - _t0)  # /10 iters * 1000

    # compute-only row: device-resident input, ONE SCALAR synced per
    # timing fence — block_until_ready is unreliable through the axon
    # tunnel (can return before the queue drains), a scalar fetch is not
    dvars = jax.device_put(variables)
    xb = jnp.asarray(images[:batch_size], jnp.bfloat16)
    f = jax.jit(lambda v, x: jnp.argmax(
        apply_fn(v, x, train=False, compute_dtype=jnp.bfloat16)[0],
        -1).astype(jnp.uint8))
    r = f(dvars, xb)
    _ = int(r[0, 0, 0])
    steps = max(n_images // batch_size, 1)
    t0 = time.perf_counter()
    for _ in range(steps):
        r = f(dvars, xb)
    _ = int(r[0, 0, 0])
    ips_compute = batch_size * steps / (time.perf_counter() - t0)

    # int8 PTQ arm (ops/quant.py): same forward with every conv on the
    # MXU int8 path (v5e int8 peak = 2x bf16). Calibrated on the bench
    # batch — quantized *throughput* does not depend on weight values.
    from pytorch_camvid_tpu.ops.quant import calibrate, quantize_variables
    amax = calibrate(apply_fn, variables, [xb.astype(jnp.bfloat16)])
    qvars = jax.device_put(quantize_variables(variables, amax))
    rq = f(qvars, xb)
    _ = int(rq[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(steps):
        rq = f(qvars, xb)
    _ = int(rq[0, 0, 0])
    ips_int8 = batch_size * steps / (time.perf_counter() - t0)

    # int8 END-TO-END arm (VERDICT r4 #5): the int8 path through the full
    # predict() pipeline — nibble pack, drain thread, real H2D/D2H
    p8 = Predictor(net, variables, batch_size=batch_size, image_hw=hw)
    p8.quantize_int8(images[:batch_size])
    p8.predict(images[: 2 * batch_size])  # compile + warm
    t0 = time.perf_counter()
    out8 = p8.predict(images)
    ips_e2e_int8 = n_images / (time.perf_counter() - t0)
    assert out8.shape == (n_images, hw[0], hw[1])
    # floors re-bracketed for the int8 arm (it runs minutes after the
    # bf16 floors; same drift rationale as above)
    floor_ms_8 = _d2h_floor_ms((batch_size, hw[0], hw[1] // 2))
    h2d_floor_8 = _h2d_floor_ms((batch_size, hw[0], hw[1], 3))

    # predicted_e2e (VERDICT r4 #1): the per-chunk timeline work
    # (tools/serving_timeline.py, run_artifacts/serving_timeline_unet.jsonl)
    # shows the tunnel serializes H2D, compute, and D2H per chunk — a
    # window=1 run decomposes to exactly that sum, and the pipelined
    # steady-state chunk period matches h2d_floor + d2h_floor + compute
    # (measured 292 ms vs 330 predicted, ratio 0.91): pipelining hides
    # the Python dispatch side and most RTTs, but transfers and compute
    # share one stream. e2e_over_predicted ~ 0.8-1.2 means "accounted
    # for"; compare THAT across rounds, not raw img/s through a
    # nonstationary tunnel.
    def predicted(ips_compute_arm, h2d, d2h):
        compute_chunk_ms = 1000.0 * batch_size / ips_compute_arm
        period_ms = h2d + d2h + compute_chunk_ms
        return batch_size / (period_ms / 1000.0)

    flops_per_image = _conv_fwd_flops(net, hw)
    peak = _bf16_peak_flops(jax.devices()[0])
    return {
        "images_per_sec": round(ips, 2),
        "mfu": _mfu(ips, flops_per_image, peak),
        # tunnel-weather normalization: e2e relative to this run's D2H
        # bound; compare THIS across rounds, not raw images_per_sec
        "d2h_floor_ms_packed_chunk": round(floor_ms, 1),
        "h2d_floor_ms_input_chunk": round(h2d_floor, 1),
        "dispatch_rtt_ms": round(rtt_ms, 2),
        "e2e_over_d2h_bound": round(ips / d2h_bound_ips, 3),
        "predicted_e2e": round(predicted(ips_compute, h2d_floor,
                                         floor_ms), 2),
        "e2e_over_predicted": round(
            ips / predicted(ips_compute, h2d_floor, floor_ms), 3),
        "images_per_sec_int8": round(ips_e2e_int8, 2),
        "int8_e2e_over_predicted": round(
            ips_e2e_int8 / predicted(ips_int8, h2d_floor_8, floor_ms_8),
            3),
        "images_per_sec_compute_only": round(ips_compute, 2),
        "mfu_compute_only": _mfu(ips_compute, flops_per_image, peak),
        "images_per_sec_compute_only_int8": round(ips_int8, 2),
        # int8 MXU peak is 2x the bf16 peak on every listed TPU generation
        "mfu_compute_only_int8": _mfu(ips_int8, flops_per_image,
                                      None if peak is None else 2 * peak),
        "int8_speedup": round(ips_int8 / ips_compute, 3),
    }


def _measure_serving_subprocess(net: str, timeout_s: float = 1200.0):
    """Run measure_serving in a CHILD process with a hard timeout.

    Round 5 observed three full tunnel stalls (HARDWARE.md 2026-08-21):
    the device link freezes for 10-40+ min, every jax call hangs in C
    code, and no in-process timeout can recover. All three stalls struck
    during or right after sustained serving D2H traffic — exactly what
    this measurement generates. Isolating it in a killable child means a
    stall costs one serving row (recorded as an error), not the whole
    bench run and its train headline."""
    import json as _json
    import os
    import subprocess
    import sys
    code = (
        "import json, bench; "
        "from pytorch_camvid_tpu.runtime import enable_compilation_cache; "
        "enable_compilation_cache(); "
        f"print('BENCHROW ' + json.dumps(bench.measure_serving({net!r})))")
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in p.stdout.splitlines():
            if line.startswith("BENCHROW "):
                return _json.loads(line[len("BENCHROW "):])
        return {"error": f"serving child rc={p.returncode}: "
                         f"{(p.stderr or p.stdout)[-400:]}"}
    except subprocess.TimeoutExpired:
        return {"error": f"serving measurement exceeded {timeout_s:.0f}s "
                         "— tunnel stall (HARDWARE.md round-5); train "
                         "rows above are unaffected"}


def main() -> dict:
    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    # each net at its measured-best batch (VERDICT r4 #3): the sweeps
    # (run_artifacts/batch_sweep_{unet,segnet}_v2.jsonl) put UNet's peak
    # at b24 (b16 83.4 / b24 84.3 / b32 80.0) and SegNet's at b32
    # (b24 110.6 / b32 114.8 / b40 110.3 / b48 101.9 — round-5 extension
    # confirms the b32 peak; remat arms unnecessary, plain b48 compiles)
    unet = measure_train("unet", batch_size=24)
    segnet = measure_train("segnet", batch_size=32)
    # same request size for both nets: r3 ran SegNet at 120 images (half
    # UNet's 240), which halves pipeline-ramp amortization and manufactured
    # a phantom 1.7x 'asymmetry' on top of tunnel jitter (VERDICT r3 #4)
    serving = _measure_serving_subprocess("unet")
    segnet_serving = _measure_serving_subprocess("segnet")

    return {
        "metric": "camvid_unet_360x480_train_images_per_sec_per_chip",
        "value": unet["images_per_sec"],
        "unit": "images/sec/chip",
        "vs_baseline": round(unet["images_per_sec"]
                             / P100_IMAGES_PER_SEC_EST, 2),
        "mfu": unet["mfu"],
        "extra": {
            "unet_train": unet,
            "segnet_train": segnet,
            "unet_serving_fwd": serving,
            "segnet_serving_fwd": segnet_serving,
        },
    }


if __name__ == "__main__":
    print(json.dumps(main()))
