"""int8 post-training quantization (ops/quant.py + serving integration).

The reference has no quantized inference path (its serving surface is the
fp32 predict.py, /root/reference/predict.py) — this is a beyond-parity TPU
capability; these tests pin its math on the CPU backend:

- BN folding is EXACT (eval BN is affine per channel),
- the quantized block approximates the float block within the error bound
  implied by 8-bit symmetric quantization,
- calibration threads amax through the existing state mechanism,
- a whole quantized UNet agrees with the float model on nearly all pixels
  and survives the Predictor round-trip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_camvid_tpu.ops.conv import conv_bn_relu_init, conv_bn_relu_apply
from pytorch_camvid_tpu.ops.quant import (
    calibrate, fold_bn, quantize_block, quantize_variables,
    quantized_block_apply)


def _random_block(key, cin, cout):
    kp, ks = jax.random.split(key)
    params, state = conv_bn_relu_init(kp, cin, cout)
    # non-trivial BN statistics and affine so folding is actually tested
    ks1, ks2, ks3, ks4 = jax.random.split(ks, 4)
    params = dict(params,
                  scale=1.0 + 0.2 * jax.random.normal(ks1, (cout,)),
                  bias=0.1 * jax.random.normal(ks2, (cout,)))
    state = {"mean": 0.3 * jax.random.normal(ks3, (cout,)),
             "var": jnp.exp(0.2 * jax.random.normal(ks4, (cout,)))}
    return params, state


def test_bn_folding_exact():
    key = jax.random.PRNGKey(0)
    params, state = _random_block(key, 16, 24)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 12, 16))
    ref, _ = conv_bn_relu_apply(params, state, x, train=False)

    w_eff, b_eff = fold_bn(params, state)
    y = jax.lax.conv_general_dilated(
        x, w_eff, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_eff
    folded = jnp.maximum(y, 0.0)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_quantized_block_close_to_float():
    key = jax.random.PRNGKey(2)
    params, state = _random_block(key, 16, 24)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 12, 16))
    ref, _ = conv_bn_relu_apply(params, state, x, train=False)

    amax = float(jnp.max(jnp.abs(x)))
    pq = quantize_block(params, state, amax)
    assert pq["w_q"].dtype == jnp.int8
    got = quantized_block_apply(pq, x, compute_dtype=jnp.float32)

    ref = np.asarray(ref)
    got = np.asarray(got)
    # 8-bit symmetric quant: relative output error a small % of the
    # output dynamic range
    scale = max(ref.max(), 1e-6)
    assert np.abs(got - ref).max() / scale < 0.05
    assert np.abs(got - ref).mean() / scale < 0.01


def test_calibration_records_running_amax():
    from pytorch_camvid_tpu.models import get_model
    init_fn, apply_fn = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    b1 = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    b2 = 2.0 * jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    amax = calibrate(apply_fn, variables, [b1, b2],
                     compute_dtype=jnp.float32)
    # stem amax must be the max over BOTH batches of max|input|
    stem = float(amax["down1"][0])
    expect = float(jnp.maximum(jnp.max(jnp.abs(b1)), jnp.max(jnp.abs(b2))))
    assert stem == pytest.approx(expect, rel=1e-6)
    # every block got a strictly positive range
    assert all(float(v) > 0 for v in jax.tree_util.tree_leaves(amax))


def test_quantized_unet_agrees_with_float():
    from pytorch_camvid_tpu.models import get_model
    init_fn, apply_fn = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    logits_f, _ = apply_fn(variables, x, train=False,
                           compute_dtype=jnp.float32)
    amax = calibrate(apply_fn, variables, [x], compute_dtype=jnp.float32)
    qvars = quantize_variables(variables, amax)
    logits_q, _ = apply_fn(qvars, x, train=False,
                           compute_dtype=jnp.float32)

    pred_f = np.asarray(jnp.argmax(logits_f, -1))
    pred_q = np.asarray(jnp.argmax(logits_q, -1))
    # fresh-init logits are near-ties, so demand strong but not perfect
    # agreement; trained models separate classes far more
    assert (pred_f == pred_q).mean() > 0.95


def test_min_cout_keeps_narrow_head_float():
    """Mixed-precision PTQ (round 4): blocks with cout < min_cout stay in
    the compute dtype — the MXU pads lanes to 64 either way, and the
    measured int8 'speedup' on the 64->12 head is 0.86x (PERF.md round-4
    int8 decomposition). min_cout=0 restores quantize-everything."""
    from pytorch_camvid_tpu.models import get_model
    for net in ("unet", "segnet"):
        init_fn, apply_fn = get_model(net, 3, 12)
        variables = init_fn(jax.random.PRNGKey(3))
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3))
        amax = calibrate(apply_fn, variables, [x],
                         compute_dtype=jnp.float32)

        q = quantize_variables(variables, amax)["params"]
        q_all = quantize_variables(variables, amax, min_cout=0)["params"]
        n_kept = 0
        for name in q:
            for i, blk in enumerate(q[name]):
                cout = variables["params"][name][i]["w"].shape[-1]
                if cout < 64:
                    assert "w" in blk and "w_q" not in blk, (net, name, i)
                    n_kept += 1
                else:
                    assert "w_q" in blk, (net, name, i)
                assert "w_q" in q_all[name][i], (net, name, i)
        assert n_kept == 1, net  # exactly the 12-class head

        # the mixed tree still runs and agrees with the float forward at
        # argmax level (head at full precision can only tighten this)
        logits_f, _ = apply_fn(variables, x, train=False,
                               compute_dtype=jnp.float32)
        logits_q, _ = apply_fn({"params": q,
                                "state": variables["state"]}, x,
                               train=False, compute_dtype=jnp.float32)
        agree = (np.asarray(jnp.argmax(logits_f, -1))
                 == np.asarray(jnp.argmax(logits_q, -1))).mean()
        assert agree > 0.95, (net, agree)


def test_fused_handoff_marks_direct_edges_only():
    """fuse_block_handoff: every non-last block of a stage list gets
    s_out == its successor's s_x. Stage-final blocks feed through
    fuse_pool_edges (round 4): encoder finals that cross ONLY a max pool
    fuse into the next encoder stage; finals that feed an upsample /
    concat / the logits keep compute-dtype output."""
    from pytorch_camvid_tpu.models import get_model
    from pytorch_camvid_tpu.ops.quant import _POOL_EDGES
    # UNet has NO pool-fusable edges (its encoder outputs double as
    # decoder skips — see _POOL_EDGES): every stage-final block keeps the
    # compute-dtype output
    init_fn, apply_fn = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    amax = calibrate(apply_fn, variables, [x], compute_dtype=jnp.float32)
    qp = quantize_variables(variables, amax)["params"]
    for name, blocks in qp.items():
        for i, blk in enumerate(blocks):
            if i < len(blocks) - 1:
                assert "s_out" in blk, (name, i)
                assert float(blk["s_out"]) == float(blocks[i + 1]["s_x"])
            else:
                assert "s_out" not in blk, (name, i)
    # SegNet fuses every pool/unpool boundary (index-only skips)
    init_s, apply_s = get_model("segnet", 3, 12)
    vs = init_s(jax.random.PRNGKey(2))
    amax_s = calibrate(apply_s, vs, [x], compute_dtype=jnp.float32)
    qs = quantize_variables(vs, amax_s)["params"]
    for a, c in _POOL_EDGES["encoder1"]:
        if "w_q" in qs[c][0]:
            assert float(qs[a][-1]["s_out"]) == float(qs[c][0]["s_x"]), a
        else:  # the bf16 head never becomes a fusion consumer
            assert "s_out" not in qs[a][-1], a


def test_fused_handoff_bitexact_at_f32_vs_unfused():
    """With float32 compute, quantize-from-epilogue equals the unfused
    path's quantize-from-activation exactly (the only difference in the
    fused path is WHERE the rounding happens, and f32 removes the
    intermediate bf16 rounding), so whole-model logits are bit-equal."""
    from pytorch_camvid_tpu.models import get_model
    for net in ("unet", "segnet"):
        init_fn, apply_fn = get_model(net, 3, 12)
        variables = init_fn(jax.random.PRNGKey(7))
        x = jax.random.normal(jax.random.PRNGKey(8), (2, 32, 32, 3))
        amax = calibrate(apply_fn, variables, [x],
                         compute_dtype=jnp.float32)
        q_unfused = quantize_variables(variables, amax, fuse_handoff=False)
        # fuse_pool=False isolates the in-stage handoff, which is exactly
        # rounding-placement-equal for both nets; SegNet's POOL-edge
        # fusion can legitimately flip argmax positions on quantized ties
        # (see test_pool_edge_fusion) so it is tested separately
        q_fused = quantize_variables(variables, amax, fuse_handoff=True,
                                     fuse_pool=False)
        ref, _ = apply_fn(q_unfused, x, train=False,
                          compute_dtype=jnp.float32)
        got, _ = apply_fn(q_fused, x, train=False,
                          compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=net)


def test_pool_edge_fusion():
    """Pool-edge int8 handoff (round 4): max pool commutes with the
    monotone quantization map, so UNet's pool-fused forward is BIT-EQUAL
    to the pool-unfused one at f32 compute. SegNet's pool records argmax
    positions on quantized values where near-ties can collapse, so its
    assertion is argmax-map agreement."""
    from pytorch_camvid_tpu.models import get_model
    init_fn, apply_fn = get_model("segnet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(11))
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 32, 32, 3))
    amax = calibrate(apply_fn, variables, [x], compute_dtype=jnp.float32)
    q_nopool = quantize_variables(variables, amax, fuse_pool=False)
    q_pool = quantize_variables(variables, amax, fuse_pool=True)
    # the pool edges really are marked
    assert "s_out" in q_pool["params"]["encoder4"][-1]
    assert "s_out" not in q_nopool["params"]["encoder4"][-1]
    ref, _ = apply_fn(q_nopool, x, train=False, compute_dtype=jnp.float32)
    got, _ = apply_fn(q_pool, x, train=False, compute_dtype=jnp.float32)
    agree = (np.asarray(jnp.argmax(got, -1))
             == np.asarray(jnp.argmax(ref, -1))).mean()
    assert agree > 0.95, agree
    # UNet: encoder outputs double as skips, so fuse_pool must be a no-op
    init_u, apply_u = get_model("unet", 3, 12)
    vu = init_u(jax.random.PRNGKey(13))
    amax_u = calibrate(apply_u, vu, [x], compute_dtype=jnp.float32)
    qu = quantize_variables(vu, amax_u, fuse_pool=True)["params"]
    for name in ("down1", "down2", "down3", "down4", "down5"):
        assert "s_out" not in qu[name][-1], name


def test_fused_handoff_bf16_agreement():
    """At bf16 compute the fused path can differ by 1 int8 LSB on round
    boundaries; demand near-total argmax agreement on a whole model."""
    from pytorch_camvid_tpu.models import get_model
    init_fn, apply_fn = get_model("segnet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(9))
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 32, 32, 3))
    amax = calibrate(apply_fn, variables, [x], compute_dtype=jnp.bfloat16)
    q_unfused = quantize_variables(variables, amax, fuse_handoff=False)
    q_fused = quantize_variables(variables, amax, fuse_handoff=True)
    ref, _ = apply_fn(q_unfused, x, train=False,
                      compute_dtype=jnp.bfloat16)
    got, _ = apply_fn(q_fused, x, train=False, compute_dtype=jnp.bfloat16)
    pred_r = np.asarray(jnp.argmax(ref, -1))
    pred_g = np.asarray(jnp.argmax(got, -1))
    assert (pred_r == pred_g).mean() > 0.95


def test_quantized_segnet_pool_dispatch():
    """int8-quantized SegNet serving selects the XLA argmax pool pair even
    where the bf16 default would be the Pallas pair: the opaque Pallas
    custom calls block the int8 requant/relayout fusion around them —
    measured 0.89x vs 1.30x whole-model on chip (PERF.md int8 section).
    An explicit PCT_POOL_IMPL still wins."""
    import os
    from pytorch_camvid_tpu.models.segnet import _pool_impl
    prev = os.environ.pop("PCT_POOL_IMPL", None)
    try:
        assert _pool_impl(quantized=True) == "argmax"
        os.environ["PCT_POOL_IMPL"] = "pallas_phase"
        assert _pool_impl(quantized=True) == "pallas_phase"
    finally:
        os.environ.pop("PCT_POOL_IMPL", None)
        if prev is not None:
            os.environ["PCT_POOL_IMPL"] = prev


def test_quantized_blocks_refuse_training():
    key = jax.random.PRNGKey(4)
    params, state = _random_block(key, 8, 8)
    pq = quantize_block(params, state, 1.0)
    x = jnp.zeros((1, 8, 8, 8))
    with pytest.raises(AssertionError):
        conv_bn_relu_apply(pq, state, x, train=True)


def test_quantized_export_stablehlo_roundtrip(tmp_path):
    """A quantized Predictor exports a self-contained int8 StableHLO
    module: the int8 weights are baked in as constants and the reloaded
    artifact reproduces the quantized predictor's outputs bit-for-bit
    (export traces self._variables, so quantize_int8 -> export composes
    with no extra machinery)."""
    import jax
    from jax import export as jexport
    from pytorch_camvid_tpu.serving import Predictor
    from pytorch_camvid_tpu.models import get_model

    init_fn, _ = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(5))
    p = Predictor("unet", variables, batch_size=2, image_hw=(24, 32),
                  compute_dtype=jnp.float32)
    imgs = np.random.default_rng(6).integers(
        0, 256, (2, 24, 32, 3), dtype=np.uint8)
    p.quantize_int8(imgs)
    want = p.predict(imgs)

    path = str(tmp_path / "unet_int8.stablehlo")
    p.export_stablehlo(path)
    with open(path, "rb") as f:
        reloaded = jexport.deserialize(f.read())
    got = np.asarray(jax.jit(reloaded.call)(imgs))
    np.testing.assert_array_equal(got, want)


def test_predictor_quantize_int8_roundtrip():
    from pytorch_camvid_tpu.serving import Predictor
    from pytorch_camvid_tpu.models import get_model
    init_fn, _ = get_model("segnet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    p = Predictor("segnet", variables, batch_size=2, image_hw=(32, 32),
                  compute_dtype=jnp.float32)
    imgs = np.random.default_rng(0).integers(
        0, 256, (3, 32, 32, 3), dtype=np.uint8)
    ref = p.predict(imgs)
    p.quantize_int8(imgs)
    got = p.predict(imgs)
    assert got.shape == ref.shape and got.dtype == np.uint8
    assert (got == ref).mean() > 0.9
