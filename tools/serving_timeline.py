"""Per-chunk serving timeline: where does each ~second of a chunk go?

VERDICT r4 #1: the serving e2e number (20.35 img/s) never reconciled
against the floors bench.py records in the same run (D2H floor -> ~151
img/s bound, dispatch RTT ~36 ms -> ~100 img/s combined model) — a ~5x
unaccounted gap. This tool drives ``Predictor.predict(timeline=...)``
(the opt-in per-chunk host-timestamp instrumentation added this round)
and prints/dumps a per-chunk budget whose rows SUM to the measured chunk
period, so the e2e number is accounted for rather than asserted.

Timeline spans per chunk (all host perf_counter):
  window_wait   t_window_clear - t_ready        (backpressure on the
                                                 bounded in-flight window
                                                 = waiting for a drain)
  h2d           t_h2d_return - t_window_clear   (blocking device_put of
                                                 the uint8 input batch)
  dispatch      t_forward_return - t_h2d_return (async forward dispatch
                                                 return = tunnel RTT)
  copy_issue    t_copy_async_issued - t_forward_return
  drain_wait    t_drain_start - t_copy_async... (queueing on the drain
                                                 thread, overlapped)
  drain_d2h     t_drain_materialized - t_drain_start (np.asarray: queue
                                                 drain + the real D2H)
  unpack        t_drain_end - t_drain_materialized (host nibble unpack)

Also measured in the same run: the standalone floors bench.py records
(fresh-array D2H, dispatch RTT, H2D) so the budget can be read against
them.

Usage:
  python tools/serving_timeline.py --net unet [--int8] [--n 240]
  -> prints the budget table and appends one JSON line per run to
     run_artifacts/serving_timeline_{net}[_int8].jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def spans_from_timeline(timeline, drop_first: int = 1):
    """Reduce raw per-chunk timestamps to per-chunk span durations (ms).
    Drops the first ``drop_first`` chunks (pipeline ramp)."""
    rows = []
    for ev in timeline[drop_first:]:
        t0 = ev["t_ready"]
        row = {"chunk": ev["chunk"]}
        row["window_wait_ms"] = 1e3 * (ev["t_window_clear"] - t0)
        row["h2d_ms"] = 1e3 * (ev["t_h2d_return"] - ev["t_window_clear"])
        prev = ev.get("t_resize_return", ev["t_h2d_return"])
        if "t_resize_return" in ev:
            row["resize_dispatch_ms"] = 1e3 * (ev["t_resize_return"]
                                               - ev["t_h2d_return"])
        row["forward_dispatch_ms"] = 1e3 * (ev["t_forward_return"] - prev)
        t_issue = ev.get("t_copy_async_issued", ev["t_forward_return"])
        row["copy_issue_ms"] = 1e3 * (t_issue - ev["t_forward_return"])
        row["dispatch_side_ms"] = 1e3 * (t_issue - t0)
        if "t_drain_start" in ev:
            row["drain_queue_ms"] = 1e3 * (ev["t_drain_start"] - t_issue)
            row["drain_d2h_ms"] = 1e3 * (ev["t_drain_materialized"]
                                         - ev["t_drain_start"])
            row["unpack_ms"] = 1e3 * (ev["t_drain_end"]
                                      - ev["t_drain_materialized"])
        rows.append(row)
    return rows


def summarize(rows, periods_ms):
    keys = sorted({k for r in rows for k in r} - {"chunk"})
    med = {k: float(np.median([r[k] for r in rows if k in r]))
           for k in keys}
    med["chunk_period_ms"] = float(np.median(periods_ms))
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="unet")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--n", type=int, default=240)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--max-inflight", type=int, default=None)
    ap.add_argument("--no-copy-async", action="store_true")
    args = ap.parse_args()

    import jax
    from pytorch_camvid_tpu.data.synthetic import synthetic_arrays
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    from pytorch_camvid_tpu.serving import Predictor
    import bench

    enable_compilation_cache()
    hw = (360, 480)
    images, _ = synthetic_arrays(args.n, hw=hw, seed=3)
    init_fn, _ = get_model(args.net, 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    p = Predictor(args.net, variables, batch_size=args.batch, image_hw=hw)
    if args.int8:
        p.quantize_int8(images[: args.batch])
    p.predict(images[: 2 * args.batch])  # compile + warm

    timeline = []
    t0 = time.perf_counter()
    out = p.predict(images, timeline=timeline,
                    max_inflight=args.max_inflight,
                    copy_async=not args.no_copy_async)
    dt = time.perf_counter() - t0
    assert out.shape == (args.n, hw[0], hw[1])
    ips = args.n / dt

    # chunk period: spacing between successive chunk completions
    ready = [ev["t_ready"] for ev in timeline]
    periods = 1e3 * np.diff(ready) if len(ready) > 1 else [dt * 1e3]
    rows = spans_from_timeline(timeline)
    med = summarize(rows, periods)

    # same-run floors (bench.py methodology)
    floor_d2h = bench._d2h_floor_ms(
        (args.batch, hw[0], hw[1] // 2 if p._pack else hw[1]))
    import jax.numpy as jnp
    g = jax.jit(lambda s: s + 1)
    _ = int(g(jnp.int32(0)))
    t1 = time.perf_counter()
    for i in range(10):
        _ = int(g(jnp.int32(i)))
    rtt_ms = 100.0 * (time.perf_counter() - t1)
    h2d_floor = bench._h2d_floor_ms((args.batch, hw[0], hw[1], 3))

    rec = {
        "net": args.net, "int8": args.int8, "batch": args.batch,
        "n": args.n, "images_per_sec": round(ips, 2),
        "max_inflight": args.max_inflight,
        "copy_async": not args.no_copy_async,
        "median_spans_ms": {k: round(v, 2) for k, v in med.items()},
        "floors": {"d2h_floor_ms": round(floor_d2h, 1),
                   "h2d_floor_ms": round(h2d_floor, 1),
                   "dispatch_rtt_ms": round(rtt_ms, 2)},
        "per_chunk": [{k: (round(v, 2) if isinstance(v, float) else v)
                       for k, v in r.items()} for r in rows],
    }
    suffix = "_int8" if args.int8 else ""
    path = os.path.join("run_artifacts",
                        f"serving_timeline_{args.net}{suffix}.jsonl")
    os.makedirs("run_artifacts", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")

    print(f"e2e {ips:.2f} img/s  chunk period {med['chunk_period_ms']:.0f} ms")
    for k in sorted(med):
        print(f"  {k:24s} {med[k]:9.2f}")
    print(f"floors: d2h {floor_d2h:.1f} ms  h2d {h2d_floor:.1f} ms  "
          f"rtt {rtt_ms:.2f} ms  -> {path}")


if __name__ == "__main__":
    main()
