"""SegNet, TPU-native functional reimplementation of models/segnet.py.

Architecture parity (models/segnet.py:19-118):
- VGG-style encoder of 2-2-3-3-3 conv3x3+BN+ReLU blocks,
  64->128->256->512->512, each stage followed by 2x2 max pool that records
  argmax indices and the pre-pool shape;
- mirrored decoder: index-unpool to the recorded shape, then conv blocks
  (the final decoder block emits class logits through BN+ReLU, matching the
  reference).

29.4M parameters (verified in tests/test_models.py).

TPU-native: the max-pool-index unpooling (torch's sparse MaxUnpool2d scatter)
is re-expressed as a dense gather — see ops/pooling.py.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.ops.conv import conv_bn_relu_init, conv_bn_relu_apply
from pytorch_camvid_tpu.ops.pooling import (
    max_pool_2x2_with_argmax, max_unpool_2x2)


def _segnet_spec(in_ch: int, num_classes: int):
    return [
        ("encoder1", [(in_ch, 64), (64, 64)]),
        ("encoder2", [(64, 128), (128, 128)]),
        ("encoder3", [(128, 256), (256, 256), (256, 256)]),
        ("encoder4", [(256, 512), (512, 512), (512, 512)]),
        ("encoder5", [(512, 512), (512, 512), (512, 512)]),
        ("decoder5", [(512, 512), (512, 512), (512, 512)]),
        ("decoder4", [(512, 512), (512, 512), (512, 256)]),
        ("decoder3", [(256, 256), (256, 256), (256, 128)]),
        ("decoder2", [(128, 128), (128, 64)]),
        ("decoder1", [(64, 64), (64, num_classes)]),
    ]


def init_segnet(key: jax.Array, input_channels: int = 3, class_num: int = 12,
                width_mult: float = 1.0):
    """width_mult < 1 scales internal channels (see models/unet.py:init_unet
    — same contract: apply reads channels from params, so narrow inits need
    no apply changes)."""
    spec = _segnet_spec(input_channels, class_num)
    if width_mult != 1.0:
        from pytorch_camvid_tpu.models.unet import _check_width_mult
        _check_width_mult(spec, width_mult, input_channels, class_num)

        def s(c):
            return max(4, int(round(c * width_mult)))
        spec = [(name, [(s(a), s(b)) for a, b in pairs])
                for name, pairs in spec]
        spec[0][1][0] = (input_channels, spec[0][1][0][1])
        spec[-1][1][-1] = (spec[-1][1][-1][0], class_num)
    n_blocks = sum(len(pairs) for _, pairs in spec)
    keys = jax.random.split(key, n_blocks)
    params, state = {}, {}
    k = 0
    for name, pairs in spec:
        params[name], state[name] = [], []
        for cin, cout in pairs:
            p, s = conv_bn_relu_init(keys[k], cin, cout)
            params[name].append(p)
            state[name].append(s)
            k += 1
    return {"params": params, "state": state}


def _pool_impl(quantized: bool = False) -> str:
    """Production pool/unpool pair selector: the Pallas packed-phase pair
    on TPU, the XLA argmax pair elsewhere (CPU tests/dryrun run the same
    math through ops/pooling.py). Override with PCT_POOL_IMPL=argmax /
    pallas_phase.

    int8-quantized serving uses the XLA argmax pair even on TPU: the
    Pallas pool/unpool custom calls are opaque to XLA fusion and layout
    assignment, so the int8<->bf16 requantize/relayout traffic around
    them materializes — measured whole-model 272 img/s (0.89x bf16) with
    the Pallas pair vs 385 img/s (1.30x) with the XLA pair
    (tools/int8_segnet_pool_ab.py, run_artifacts/int8_segnet_pool_ab.jsonl);
    bf16 keeps the Pallas pair (305.5 vs 296.2 the other way)."""
    impl = os.environ.get("PCT_POOL_IMPL", "")
    if impl:
        return impl
    if quantized:
        return "argmax"
    return ("pallas_phase" if jax.default_backend() == "tpu"
            else "argmax")


def apply_segnet(variables, x: jax.Array, *, train: bool = False,
                 axis_name: Optional[str] = None,
                 compute_dtype=jnp.float32, use_pallas: bool = False,
                 remat: bool = False):
    """Forward pass. x: (N, H, W, C) float. Returns (logits NHWC, new_state).

    use_pallas=True (eval only) uses the fused conv and pool/unpool Pallas
    kernels (ops/pallas_conv.py, ops/pallas_pool.py). remat=True
    checkpoints each conv stage (models/unet.py::_stage_fn) — pool indices
    stay stored (the unpool needs them), conv activations recompute."""
    from pytorch_camvid_tpu.models.unet import _stage_fn
    params, state = variables["params"], variables["state"]
    ns = {}
    pallas = use_pallas and not train
    stage_fn = _stage_fn(train=train, axis_name=axis_name,
                         compute_dtype=compute_dtype, use_pallas=use_pallas,
                         remat=remat)

    def stage(n, v):
        v, ns[n] = stage_fn(params[n], state[n], v)
        return v

    if pallas:
        from pytorch_camvid_tpu.ops.pallas_pool import (
            max_pool_2x2_argmax_pallas, max_unpool_2x2_pallas)
        pool_fn, unpool_fn = (max_pool_2x2_argmax_pallas,
                              max_unpool_2x2_pallas)
    elif _pool_impl(
            quantized="w_q" in params["encoder1"][0]) == "pallas_phase":
        # TPU production pair (round 3): packed-view Pallas pool emitting
        # int8 phases + natural-layout Pallas unpool, custom VJPs reusing
        # the same kernels for the backward — measured faster than the
        # XLA argmax pair per-pair and in the full train step (PERF.md
        # round-3 pool section; HARDWARE.md ledger)
        from pytorch_camvid_tpu.ops.pallas_pool import (
            pool_phase_packed_train, unpool_phase_packed_train)
        pool_fn, unpool_fn = (pool_phase_packed_train,
                              unpool_phase_packed_train)
    else:
        # XLA backends (CPU tests/dryrun, and PCT_POOL_IMPL=argmax escape
        # hatch): the argmax pair — the XLA int8-phase pair was measured
        # SLOWER (54.7 vs 35.3 ms standalone, 81.9 vs 104.3 img/s in the
        # full train step) — PERF.md round-3 pool section
        pool_fn, unpool_fn = max_pool_2x2_with_argmax, max_unpool_2x2

    x = x.astype(compute_dtype)
    skips = []  # (indices, pre-pool (H, W)) per encoder stage
    for i in range(1, 6):
        x = stage(f"encoder{i}", x)
        hw = (x.shape[1], x.shape[2])
        x, idx = pool_fn(x)
        skips.append((idx, hw))

    for i in range(5, 0, -1):
        idx, hw = skips[i - 1]
        x = unpool_fn(x, idx, hw)
        x = stage(f"decoder{i}", x)

    return x.astype(jnp.float32), ns
