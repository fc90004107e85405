"""Train-throughput batch-size sweep on the attached device.

The headline bench row (bench.py) measures the full train step at batch
24 only — the batch the round-1 recipe settled on, not a measured
optimum. This tool sweeps measure_train over batch sizes so the
images/sec/chip headline sits on a measured curve instead of one point
(reference analogue: the reference trains at a fixed ``-b`` with no
sweep anywhere, train.py:36).

One JSON line per (net, batch) to stdout and, with -out, appended to a
JSONL artifact. OOMs are caught and recorded as rows with an "error"
field so the HBM ceiling is part of the curve.

Usage:
    python tools/batch_sweep.py -net unet -batches 16 24 32 48 -steps 60
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-net", type=str, default="unet")
    parser.add_argument("-batches", type=int, nargs="+",
                        default=[16, 24, 32, 48])
    parser.add_argument("-steps", type=int, default=60)
    parser.add_argument("-remat", action="store_true", default=False,
                        help="stage rematerialization (jax.checkpoint) — "
                             "for batches past the plain HBM ceiling")
    parser.add_argument("-out", type=str, default=None,
                        help="JSONL artifact to append rows to")
    args = parser.parse_args(argv)

    from pytorch_camvid_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from bench import measure_train

    # dedupe: skip (net, batch, remat) configs already recorded in -out
    # (ADVICE r3: retried runs duplicated rows and made artifacts noisy)
    done = set()
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    if "error" not in r:  # failed rows may be retried
                        done.add((r["net"], r["batch_size"],
                                  r.get("remat", False)))
                except ValueError:
                    pass

    ansi = re.compile(r"\x1b\[[0-9;]*m")
    rows = []
    for b in args.batches:
        if (args.net, b, args.remat) in done:
            print(json.dumps({"net": args.net, "batch_size": b,
                              "remat": args.remat, "skipped":
                              "already recorded"}), flush=True)
            continue
        row = {"net": args.net, "batch_size": b, "steps": args.steps,
               "remat": args.remat}
        try:
            row.update(measure_train(args.net, batch_size=b,
                                     steps=args.steps, remat=args.remat))
        except Exception as e:  # XlaRuntimeError OOM etc. — part of the curve
            # strip ANSI escapes and keep the full first line + cause tail
            msg = ansi.sub("", f"{type(e).__name__}: {e}")
            row["error"] = msg[:1000]
        print(json.dumps(row), flush=True)
        rows.append(row)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
    return rows


if __name__ == "__main__":
    main()
