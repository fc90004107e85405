"""Conv + BatchNorm + ReLU — the workhorse block of both models.

Reference: ``BasicConv2d`` (models/unet.py:5-17) and ``BasicConv``
(models/segnet.py:5-17): Conv2d 3x3 pad-1 (cuDNN) -> BatchNorm2d -> ReLU.

TPU-native design:
- NHWC layout / HWIO kernels — the native layout for TPU convolutions;
  XLA lowers ``lax.conv_general_dilated`` onto the MXU.
- The block is a *function pair* (init, apply) over a parameter pytree; BN
  running stats live in a separate mutable-state pytree threaded through
  the (pure) apply.
- Compute may run in bfloat16 (params stay float32); XLA fuses the BN affine
  + ReLU epilogue into the convolution, so no hand-written fusion is needed
  for the elementwise tail — the conv itself is the MXU op.
- Under data parallelism, batch statistics can be averaged across the mesh
  ('sync BN') with ``lax.pmean`` when ``axis_name`` is given; the reference
  is single-device (train.py:95) so per-replica stats are also supported.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from pytorch_camvid_tpu.ops.initializers import conv_kernel_init, conv_bias_init

BN_EPS = 1e-5       # torch.nn.BatchNorm2d default
BN_MOMENTUM = 0.1   # torch: running = (1-m)*running + m*batch


def _wgroup_stem() -> bool:
    """Opt-in toggle for the wgroup stem path (PCT_WGROUP_STEM=1 enables).

    Default OFF: the standalone-op probe showed wgroup(2) 1.76x faster on
    the stem, but the IN-CONTEXT A/B reversed it — full-model eval forward
    283 -> 198 img/s with the wgroup stem (layout/fusion interactions eat
    the op win), and training lost ~10.5 ms/step to its backward. Numerics
    are equal either way; the formulation stays available for
    experimentation and as a measured negative result (PERF.md)."""
    import os
    return os.environ.get("PCT_WGROUP_STEM", "0") == "1"


def conv2d(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
           stride: int = 1, padding: str | Tuple = "SAME",
           allow_wgroup: bool = False) -> jax.Array:
    """NHWC conv with HWIO kernel; accumulates in float32 on the MXU.

    Shape-directed formulation (all measured on chip, b24 360x480 —
    run_artifacts/shallow_conv_b24.jsonl; every variant is oracle- and
    gradient-tested equal to the direct conv in tests/test_conv_alt.py):
    - Cout < 64 narrow head: zero-pad Cout to 64 and slice — 14.9 ->
      7.0 ms measured; the padded channels also speed up dgrad/wgrad.
    - Cin <= 4 RGB stem: direct conv by default. wgroup(2) measures
      1.76x faster as a STANDALONE op, but the in-context A/B reversed
      it (full-model eval 283 -> 198 img/s; training +10.5 ms/step from
      its backward) — opt-in via allow_wgroup + PCT_WGROUP_STEM=1, kept
      as a measured negative result (PERF.md).
    - everything else: direct conv (measured at 91-102% of roofline on
      the deep shapes; every alternative measured slower on 64->64 and
      128->64 — PERF.md).
    """
    # No preferred_element_type: output dtype follows the inputs (bf16 in /
    # bf16 out keeps fwd and bwd dtypes consistent); the MXU still
    # accumulates bf16 products in float32 internally.
    cin, cout = w.shape[-2], w.shape[-1]
    is_same3x3 = (stride == 1 and padding == "SAME"
                  and w.shape[0] == w.shape[1] == 3)
    if is_same3x3 and allow_wgroup and cin <= 4 and x.shape[2] % 2 == 0 \
            and _wgroup_stem():
        from pytorch_camvid_tpu.ops.conv_alt import wgroup_conv3x3
        y = wgroup_conv3x3(x, w.astype(x.dtype), 2,
                           preferred_element_type=None)
        if b is not None:
            y = y + b.astype(y.dtype)
        return y
    if cout < 64:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 64 - cout)))
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if cout < 64:
        y = y[..., :cout]
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_bn_relu_init(key: jax.Array, cin: int, cout: int, ksize: int = 3):
    """Init one conv3x3+BN+ReLU block.

    Returns (params, state): params = {w, b, scale, bias},
    state = {mean, var} (BN running statistics).
    """
    kw, kb = jax.random.split(key)
    fan_in = cin * ksize * ksize
    params = {
        "w": conv_kernel_init(kw, (ksize, ksize, cin, cout)),
        "b": conv_bias_init(kb, cout, fan_in),
        "scale": jnp.ones((cout,), jnp.float32),
        "bias": jnp.zeros((cout,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((cout,), jnp.float32),
        "var": jnp.ones((cout,), jnp.float32),
    }
    return params, state


def conv_bn_relu_apply(params, state, x: jax.Array, *, train: bool,
                       axis_name: Optional[str] = None,
                       compute_dtype=jnp.float32,
                       use_pallas: bool = False):
    """Apply conv3x3(pad1) + BN + ReLU.

    In train mode BN uses batch statistics (biased variance, matching torch's
    normalization; running_var is updated with the *unbiased* estimate, also
    matching torch) and returns updated running stats. In eval mode running
    stats are used and state is returned unchanged.

    use_pallas=True routes eval mode through the single-pass fused Pallas
    kernel (ops/pallas_conv.py). In train mode it swaps the conv itself for
    the custom-VJP Pallas kernel family (ops/pallas_conv_train.py) — the
    BN/ReLU tail stays outside because batch statistics need a global
    reduction either way.

    Two content-keyed serving modes (ops/quant.py; models stay untouched):
    - ``"w_q" in params``: int8 post-training-quantized block —
      relu(conv_int8(q(x), w_q) * (s_x*s_w) + folded-BN bias).
    - ``"amax" in state`` (eval only): calibration — the ordinary eval
      forward, plus the running max|block input| returned in new_state.
    """
    if "w_q" in params:
        from pytorch_camvid_tpu.ops.quant import quantized_block_apply
        assert not train, "int8-quantized blocks are serving-only"
        return quantized_block_apply(params, x,
                                     compute_dtype=compute_dtype), state
    if use_pallas and not train:
        from pytorch_camvid_tpu.ops.pallas_conv import (
            conv_bn_relu_apply_pallas)
        return conv_bn_relu_apply_pallas(params, state,
                                         x.astype(compute_dtype))

    if use_pallas and train:
        from pytorch_camvid_tpu.ops.pallas_conv_train import (
            conv3x3_pallas, pallas_train_supported)
        xc = x.astype(compute_dtype)
        itemsize = 2 if xc.dtype == jnp.bfloat16 else 4
        if pallas_train_supported(xc.shape, params["w"].shape[-1],
                                  itemsize):
            y = conv3x3_pallas(xc, params["w"].astype(xc.dtype))
            y = y + params["b"].astype(y.dtype)
        else:
            # per-shape fallback: layers whose dW slab cannot tile into
            # VMEM (deep bottlenecks at small H) take the XLA conv so
            # whole-model Pallas training still runs as a mixed path
            y = conv2d(x.astype(compute_dtype), params["w"], params["b"],
                       allow_wgroup=False)
    else:
        y = conv2d(x.astype(compute_dtype), params["w"], params["b"],
                   allow_wgroup=not train)
    y = y.astype(jnp.float32)

    if train:
        # mean/var over N,H,W per channel.
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(y), axis=(0, 1, 2)) - jnp.square(mean)
        if axis_name is not None:
            # sync-BN: average moments across the data-parallel mesh axis.
            mean = lax.pmean(mean, axis_name)
            var = lax.pmean(jnp.mean(jnp.square(y), axis=(0, 1, 2)),
                            axis_name) - jnp.square(mean)
        n = y.shape[0] * y.shape[1] * y.shape[2]
        if axis_name is not None:
            n = n * lax.psum(1, axis_name)
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
        if "amax" in state:
            # calibration pass (ops/quant.py): record the running
            # max|block input| through the ordinary state-threading path
            new_state = dict(state, amax=jnp.maximum(
                state["amax"],
                jnp.max(jnp.abs(x)).astype(jnp.float32)))

    inv = lax.rsqrt(var + BN_EPS) * params["scale"]
    y = (y - mean) * inv + params["bias"]
    y = jnp.maximum(y, 0.0)
    return y.astype(compute_dtype), new_state
