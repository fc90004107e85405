"""Post-training int8 quantization for the serving path.

The reference has no quantized inference (its serving story is
``predict.py`` in fp32 — /root/reference/predict.py:1-60); this is a
beyond-parity TPU capability: the v5e MXU runs int8 x int8 -> int32 at
~2x the bf16 FLOP rate, and the chained per-shape probe measured real
conv speedups of 1.4-2.0x on every hot UNet shape (PERF.md, int8 table).

Design (standard PTQ, TPU-shaped):
- **BN folding**: eval-mode BatchNorm is an affine per-channel transform,
  so it folds into the conv weights/bias exactly:
  ``w_eff = w * g[c]``, ``b_eff = (b - mean) * g + beta`` with
  ``g = scale * rsqrt(var + eps)``. The quantized block is then
  ``relu(conv_int8(x_q, w_q) * (s_x * s_w[c]) + b_eff)``.
- **Per-output-channel symmetric weights**: ``s_w[c] = max|w_eff[..,c]|/127``
  — per-channel scales cost nothing on TPU (they fuse into the conv
  epilogue) and are what keeps folded-BN weight ranges sane.
- **Per-tensor symmetric activations**, calibrated: ``s_x = amax/127``
  where ``amax`` is the running max|conv input| observed over calibration
  batches. Calibration rides the existing BN-state threading: seed each
  block's state with ``amax=0`` and the eval forward returns the updated
  running max in ``new_state`` — no model changes, no Python-side hooks.
- **Only the convs quantize.** Activations between blocks stay in the
  compute dtype (bf16); each block re-quantizes its own input. Pool /
  resize / concat / pad all stay dense bf16 ops — requantization is
  elementwise and XLA fuses it into the surrounding ops, while the MXU
  gets int8 operands for every matmul-shaped FLOP in the model.
- **Fused int8 handoff on direct conv->conv edges** (round 3): whole-model
  measurement showed the per-block requantize does NOT fuse for free —
  UNet int8 landed at 1.195x and SegNet at 0.895x (a net slowdown)
  despite 1.4-2.0x per-conv speedups (PERF.md int8 section). Where block
  i feeds block i+1 directly (consecutive entries of a stage's block
  list — both models chain stages this way, models/unet.py::_stage,
  models/segnet.py::apply_segnet), ``fuse_block_handoff`` stores the
  successor's activation scale as ``s_out`` on the producer, whose
  epilogue then emits the int8 operand the successor needs directly:
  the bf16 intermediate is never materialized (int8 write + int8 read =
  1/4 the HBM traffic of the unfused edge) and the consumer's separate
  quantize op disappears. Numerics differ from the unfused path only by
  quantizing from the f32 epilogue instead of its bf16 rounding — at
  most 1 int8 LSB on round-boundary values (tested).
- **Pool-edge fusion + mixed precision** (round 4, measured in
  run_artifacts/int8_model_decomp.jsonl / PERF.md round-4 int8 section):
  ``fuse_pool_edges`` extends the handoff ACROSS max-pool/unpool
  boundaries where the producer has no other consumer (SegNet's 9
  boundaries: 1.284x -> 1.564x whole-model; UNet has none — its encoder
  outputs double as decoder skips), and ``min_cout`` keeps narrow-cout
  blocks (the 12-class head, a measured 0.86x int8 LOSS under 64-lane
  MXU padding) in the compute dtype.

The quantized model is a pure pytree transform: ``quantize_variables``
maps trained ``{"params", "state"}`` -> the same tree with each block's
params replaced by ``{w_q, s_w, s_x, b_eff}``; ``conv_bn_relu_apply``
dispatches on the presence of ``w_q`` (ops/conv.py). Everything stays
jittable with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from pytorch_camvid_tpu.ops.conv import BN_EPS

QMAX = 127.0


def fold_bn(params, state):
    """Fold eval-mode BN into the conv: returns (w_eff, b_eff) float32.

    Exact for eval mode: BN(conv(x, w) + b) == conv(x, w_eff) + b_eff.
    """
    g = params["scale"] * lax.rsqrt(state["var"] + BN_EPS)
    w_eff = params["w"].astype(jnp.float32) * g  # broadcast over cout
    b_eff = (params["b"].astype(jnp.float32) - state["mean"]) * g \
        + params["bias"]
    return w_eff, b_eff


def quantize_block(params, state, amax):
    """One conv+BN+ReLU block -> int8 serving params.

    amax: calibrated max|x| of the block's input (scalar, float32).
    """
    w_eff, b_eff = fold_bn(params, state)
    s_w = jnp.max(jnp.abs(w_eff), axis=(0, 1, 2)) / QMAX
    s_w = jnp.maximum(s_w, 1e-12)  # all-zero channels stay harmless
    w_q = jnp.clip(jnp.round(w_eff / s_w), -QMAX, QMAX).astype(jnp.int8)
    s_x = jnp.maximum(jnp.asarray(amax, jnp.float32), 1e-12) / QMAX
    return {"w_q": w_q, "s_w": s_w, "s_x": s_x, "b_eff": b_eff}


def _map_blocks(tree, fn):
    """Apply fn to every per-block dict ({'mean','var',...} leaf-dicts)."""
    if isinstance(tree, dict) and "mean" in tree and "var" in tree:
        return fn(tree)
    if isinstance(tree, dict):
        return {k: _map_blocks(v, fn) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_map_blocks(v, fn) for v in tree)
    return tree


def _zip3_blocks(params, state, amax, fn):
    """Recurse three structurally-parallel trees down to block level."""
    if isinstance(params, dict) and "w" in params:
        return fn(params, state, amax)
    if isinstance(params, dict):
        return {k: _zip3_blocks(params[k], state[k], amax[k], fn)
                for k in params}
    if isinstance(params, (list, tuple)):
        return type(params)(_zip3_blocks(p, s, a, fn)
                            for p, s, a in zip(params, state, amax))
    return params


def calibrate(apply_fn, variables, batches, compute_dtype=jnp.bfloat16):
    """Run eval forwards over calibration batches, returning the amax tree.

    apply_fn(variables, x, train=False, compute_dtype=...) -> (y, new_state)
    — i.e. apply_unet / apply_segnet. batches: iterable of (N,H,W,C) float
    arrays, already preprocessed exactly as serving will feed the model.
    """
    state = _map_blocks(variables["state"],
                        lambda s: dict(s, amax=jnp.zeros((), jnp.float32)))
    vars_c = {"params": variables["params"], "state": state}
    fwd = jax.jit(lambda v, x: apply_fn(v, x, train=False,
                                        compute_dtype=compute_dtype)[1])
    for x in batches:
        new_state = fwd(vars_c, x)
        vars_c = {"params": vars_c["params"], "state": new_state}
    return _map_blocks(vars_c["state"], lambda s: s["amax"])


def fuse_block_handoff(params_q):
    """Mark direct conv->conv edges for fused int8 handoff (in place).

    Both models store each stage's blocks as a LIST whose consecutive
    entries are applied back-to-back with nothing in between
    (models/unet.py::_stage, models/segnet.py::apply_segnet stage
    closure); for every such edge the producer gets ``s_out`` = the
    consumer's ``s_x``, so its epilogue emits the consumer's int8 operand
    directly and the consumer skips its own input quantization. The last
    block of each list keeps the compute-dtype output (it feeds a pool /
    resize / concat / the logits)."""
    if isinstance(params_q, dict):
        return {k: fuse_block_handoff(v) for k, v in params_q.items()}
    if isinstance(params_q, (list, tuple)):
        out = [fuse_block_handoff(v) for v in params_q]
        for i in range(len(out) - 1):
            if (isinstance(out[i], dict) and "w_q" in out[i]
                    and isinstance(out[i + 1], dict)
                    and "w_q" in out[i + 1]):
                out[i] = dict(out[i], s_out=out[i + 1]["s_x"])
        return type(params_q)(out)
    return params_q


# Stage edges that cross ONLY a max-pool / max-unpool between stage-final
# and stage-initial conv blocks, with the producer's output consumed by
# NOTHING else. Max-pool commutes exactly with the monotone symmetric
# quantization map (round/clip is non-decreasing, so the window max
# quantizes to the max of the quantized window), and unpool is a value
# scatter whose fill is 0 == quantize(0) — so the producer can emit the
# consumer's int8 operand ACROSS the pool: the pool moves half the HBM
# bytes and the consumer's requantize pass disappears.
#
# SegNet qualifies on every boundary: its skips are the pooled argmax
# INDICES, never values (models/segnet.py::apply_segnet), so each
# encoder/decoder output has exactly one consumer. UNet does NOT: every
# encoder stage output is also a decoder skip (models/unet.py::apply_unet
# concatenates xd1..xd4), so emitting int8 there replaces the bf16 skip
# values with doubly-quantized ones — measured 62% logit mismatch /
# 0.84 argmax agreement on the fused tree, i.e. a quality regression, not
# an optimization (and its decoder edges cross a bilinear upsample, where
# linear interpolation does not commute with rounding). UNet therefore
# has no pool-fusable edges.
_POOL_EDGES = {
    "encoder1": [("encoder1", "encoder2"), ("encoder2", "encoder3"),
                 ("encoder3", "encoder4"), ("encoder4", "encoder5"),
                 ("encoder5", "decoder5"), ("decoder5", "decoder4"),
                 ("decoder4", "decoder3"), ("decoder3", "decoder2"),
                 ("decoder2", "decoder1")],
}


def fuse_pool_edges(params_q):
    """Fuse the int8 handoff across max-pool/unpool stage boundaries (see
    _POOL_EDGES). Model family auto-detected from stage names; unknown
    trees pass through unchanged. SegNet note: the pool's tie-breaking
    argmax runs on quantized values, so near-ties can select a different
    (equal-valued) position than the float pool — unpool placement may
    differ there; UNet's plain max is bit-exact at f32 compute
    (tests/test_quant.py)."""
    if not isinstance(params_q, dict):
        return params_q
    edges = next((v for k, v in _POOL_EDGES.items() if k in params_q),
                 None)
    if edges is None:
        return params_q
    out = dict(params_q)
    for a, c in edges:
        ba, bc = out.get(a), out.get(c)
        if (ba and bc and isinstance(ba[-1], dict) and "w_q" in ba[-1]
                and isinstance(bc[0], dict) and "w_q" in bc[0]
                and "s_out" not in ba[-1]):
            ba = list(ba)
            ba[-1] = dict(ba[-1], s_out=bc[0]["s_x"])
            out[a] = type(params_q[a])(ba)
    return out


def quantize_variables(variables, amax_tree, fuse_handoff: bool = True,
                       min_cout: int = 64, fuse_pool: bool = True):
    """Trained variables + calibrated amax tree -> int8 serving variables.

    The returned tree has the same structure; each block's params become
    {w_q, s_w, s_x, b_eff} (state is kept, unused, so tree paths stay
    stable for sharding/serialization). fuse_handoff=True additionally
    fuses direct conv->conv edges (see fuse_block_handoff); pass False
    for the per-block-requantize reference path.

    min_cout: blocks with fewer output channels stay in the compute
    dtype (mixed-precision PTQ). The MXU pads lanes to 64 either way, so
    a narrow head gains nothing from int8 operands while still paying
    input-quantize + f32-dequant epilogue — measured 0.86x on UNet's
    64->12 head at 360x480 (run_artifacts/int8_model_decomp.jsonl,
    PERF.md round-4 int8 decomposition). Quality: the head stays at full
    serving precision, which can only help mIOU. Pass min_cout=0 for the
    quantize-everything round-3 behavior."""
    def q_or_keep(params, state, amax):
        if params["w"].shape[-1] < min_cout:
            return params
        return quantize_block(params, state, amax)

    params_q = _zip3_blocks(variables["params"], variables["state"],
                            amax_tree, q_or_keep)
    if fuse_handoff:
        params_q = fuse_block_handoff(params_q)
        if fuse_pool:
            params_q = fuse_pool_edges(params_q)
    return {"params": params_q, "state": variables["state"]}


def conv2d_int8(x_q: jax.Array, w_q: jax.Array) -> jax.Array:
    """int8 NHWC x HWIO -> int32, with the same Cout<64 pad guard as the
    bf16 conv2d (ops/conv.py:80-87) so the 12-class head keeps 64 lanes."""
    cout = w_q.shape[-1]
    if cout < 64:
        w_q = jnp.pad(w_q, ((0, 0), (0, 0), (0, 0), (0, 64 - cout)))
    y = lax.conv_general_dilated(
        x_q, w_q, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    if cout < 64:
        y = y[..., :cout]
    return y


def quantized_block_apply(params_q, x: jax.Array, compute_dtype=jnp.bfloat16):
    """relu(conv_int8(q(x), w_q) * (s_x*s_w) + b_eff) in the compute dtype.

    Fused-handoff contract (fuse_block_handoff): an int8 ``x`` is already
    quantized at this block's ``s_x`` by the producing block's epilogue
    and is used as the conv operand directly; when ``s_out`` is present
    the epilogue emits the NEXT block's int8 operand instead of a
    compute-dtype activation."""
    s_x = params_q["s_x"]
    if x.dtype == jnp.int8:
        x_q = x
    else:
        # symmetric per-tensor activation quant; round-to-nearest-even
        # like XLA
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                       -QMAX, QMAX).astype(jnp.int8)
    acc = conv2d_int8(x_q, params_q["w_q"])
    y = acc.astype(jnp.float32) * (s_x * params_q["s_w"]) \
        + params_q["b_eff"]
    y = jnp.maximum(y, 0.0)
    if "s_out" in params_q:
        return jnp.clip(jnp.round(y / params_q["s_out"]),
                        -QMAX, QMAX).astype(jnp.int8)
    return y.astype(compute_dtype)
