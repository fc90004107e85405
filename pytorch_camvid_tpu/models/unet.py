"""UNet, TPU-native functional reimplementation of models/unet.py.

Architecture parity (models/unet.py:35-156):
- encoder: 5 stages of two conv3x3+BN+ReLU blocks, 64->128->256->512->1024,
  2x2 max pool between stages;
- decoder: 4x (bilinear 2x upsample align_corners=True + conv block
  ["UpSample2d", models/unet.py:19-32], pad-to-match skip, channel concat,
  two conv blocks);
- output head is itself a conv+BN+ReLU block (models/unet.py:91), so logits
  are non-negative — reproduced deliberately for weight-level parity
  (SURVEY.md §2.5.6).

34.5M parameters (verified against the reference in tests/test_models.py).

TPU-native: NHWC pytree-functional, all ops jittable with static shapes; the
pad-to-match uses only shape arithmetic known at trace time.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.ops.conv import conv_bn_relu_init, conv_bn_relu_apply
from pytorch_camvid_tpu.ops.pooling import max_pool_2x2
from pytorch_camvid_tpu.ops.resize import upsample2x_bilinear_align_corners

# (name, [channel pairs for the conv blocks in the stage])
def _unet_spec(in_ch: int, num_classes: int):
    return [
        ("down1", [(in_ch, 64), (64, 64)]),
        ("down2", [(64, 128), (128, 128)]),
        ("down3", [(128, 256), (256, 256)]),
        ("down4", [(256, 512), (512, 512)]),
        ("down5", [(512, 1024), (1024, 1024)]),
        ("upsample1", [(1024, 512)]),
        ("up1", [(1024, 512), (512, 512)]),
        ("upsample2", [(512, 256)]),
        ("up2", [(512, 256), (256, 256)]),
        ("upsample3", [(256, 128)]),
        ("up3", [(256, 128), (128, 128)]),
        ("upsample4", [(128, 64)]),
        ("up4", [(128, 64), (64, 64)]),
        ("output", [(64, num_classes)]),
    ]


def _check_width_mult(spec, width_mult: float, in_ch: int, num_classes: int):
    """Validate a width multiplier at init time (ADVICE r4 #1).

    Concat/skip edges require the per-channel scaling to be ADDITIVE:
    s(c1+c2) == s(c1)+s(c2) (e.g. UNet's up1 conv consumes the channel
    concat of upsample1's output and down4's skip). The scale function
    s(c) = max(4, round(c*w)) is only additive when every scaled internal
    channel is an exact integer >= the clamp floor — then s(c) == c*w
    exactly and linearity holds. Reject anything else up front with a
    clear message instead of crashing inside apply with a shape error."""
    internal = sorted({c for _, pairs in spec for pair in pairs
                       for c in pair})
    internal = [c for c in internal if c not in (in_ch, num_classes)]
    bad = [c for c in internal
           if (c * width_mult != int(c * width_mult)
               or c * width_mult < 4)]
    if bad:
        raise ValueError(
            f"width_mult={width_mult} is invalid: scaled channels for "
            f"{bad} are fractional or below the clamp floor of 4, which "
            f"breaks concat-edge additivity (s(c1+c2) must equal "
            f"s(c1)+s(c2)). Use a multiplier where every internal channel "
            f"count times width_mult is an integer >= 4 (e.g. 1/8 for "
            f"the 64..1024 family).")


def init_unet(key: jax.Array, input_channels: int = 3, class_num: int = 12,
              width_mult: float = 1.0):
    """width_mult < 1 scales every internal channel count (data-facing
    input_channels / class_num edges untouched). apply_unet reads channel
    counts from the params tree, so a narrow init needs no apply changes —
    used by the multichip dryrun to test sharding *plumbing* without paying
    the 34.5M-param flagship's single-core XLA compile time."""
    spec = _unet_spec(input_channels, class_num)
    if width_mult != 1.0:
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


def _stage_fn(*, train, axis_name, compute_dtype, use_pallas=False,
              remat=False):
    """Pure per-stage body (list of conv+BN+ReLU blocks). With remat=True
    the stage is wrapped in ``jax.checkpoint``: the backward recomputes the
    stage's activations from its input instead of storing them — activation
    memory drops to roughly one tensor per stage at the cost of one extra
    forward (the standard TPU HBM<->FLOPs trade; unlike grad_accum this
    keeps full-batch BatchNorm statistics)."""

    def stage(stage_params, stage_state, x):
        new_states = []
        for p, s in zip(stage_params, stage_state):
            x, ns = conv_bn_relu_apply(p, s, x, train=train,
                                       axis_name=axis_name,
                                       compute_dtype=compute_dtype,
                                       use_pallas=use_pallas)
            new_states.append(ns)
        return x, new_states

    return jax.checkpoint(stage) if remat else stage


def _pad_to_match(x: jax.Array, skip: jax.Array) -> jax.Array:
    """F.pad([dw//2, dw-dw//2, dh//2, dh-dh//2]) (models/unet.py:120-123)."""
    dh = skip.shape[1] - x.shape[1]
    dw = skip.shape[2] - x.shape[2]
    return jnp.pad(x, ((0, 0), (dh // 2, dh - dh // 2),
                       (dw // 2, dw - dw // 2), (0, 0)))


def apply_unet(variables, x: jax.Array, *, train: bool = False,
               axis_name: Optional[str] = None,
               compute_dtype=jnp.float32, use_pallas: bool = False,
               remat: bool = False):
    """Forward pass. x: (N, H, W, C) float. Returns (logits NHWC, new_state).

    use_pallas=True (eval only) runs every conv block through the fused
    Pallas kernel (ops/pallas_conv.py). remat=True checkpoints each stage
    (see _stage_fn) — same math, ~per-stage activation memory."""
    params, state = variables["params"], variables["state"]
    ns = {}
    stage_fn = _stage_fn(train=train, axis_name=axis_name,
                         compute_dtype=compute_dtype, use_pallas=use_pallas,
                         remat=remat)

    def stage(n, v):
        y, ns[n] = stage_fn(params[n], state[n], v)
        return y

    x = x.astype(compute_dtype)
    xd1 = stage("down1", x)
    xd2 = stage("down2", max_pool_2x2(xd1))
    xd3 = stage("down3", max_pool_2x2(xd2))
    xd4 = stage("down4", max_pool_2x2(xd3))
    x = stage("down5", max_pool_2x2(xd4))

    for i, skip in ((1, xd4), (2, xd3), (3, xd2), (4, xd1)):
        x = upsample2x_bilinear_align_corners(x)
        x = stage(f"upsample{i}", x)
        x = _pad_to_match(x, skip)
        x = jnp.concatenate([x, skip], axis=-1)
        x = stage(f"up{i}", x)

    logits = stage("output", x)
    return logits.astype(jnp.float32), ns
