"""End-to-end slice (BASELINE config 1): UNet train step on CPU, loss
decreases on a synthetic fixture; checkpoint round-trip is step-exact."""

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.data.synthetic import synthetic_arrays
from pytorch_camvid_tpu.models import get_model
from pytorch_camvid_tpu.train import (
    TrainState, adamw, make_train_step, make_eval_step, onecycle_lr,
    onecycle_beta1)
from pytorch_camvid_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, checkpoint_name, get_weight_path,
    parse_epoch)
from pytorch_camvid_tpu.ops.metrics import iou_from_confusion


def _setup(model="unet", hw=(48, 64), n=8, num_classes=12):
    images, labels = synthetic_arrays(n, hw, num_classes)
    x = (jnp.asarray(images, jnp.float32) / 255.0 - 0.4) / 0.3
    y = jnp.asarray(labels, jnp.int32)
    init_fn, apply_fn = get_model(model, 3, num_classes)
    variables = init_fn(jax.random.PRNGKey(0))
    return x, y, variables, apply_fn


def test_unet_loss_decreases():
    x, y, variables, apply_fn = _setup("unet")
    opt = adamw(weight_decay=0.0)
    total_steps = 30
    step_fn = jax.jit(make_train_step(
        apply_fn, opt, onecycle_lr(1e-3, total_steps),
        onecycle_beta1(total_steps)), donate_argnums=0)
    state = TrainState.create(variables, opt)

    losses = []
    for i in range(12):
        state, metrics = step_fn(state, (x, y))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses
    assert int(state.step) == 12
    # metric surface parity: loss/lr/beta1 + last-layer grad norms
    assert {"loss", "lr", "beta1", "grad_norm_w", "grad_norm_b"} <= set(
        metrics.keys())


def test_segnet_trains():
    x, y, variables, apply_fn = _setup("segnet", hw=(32, 32), n=4)
    opt = adamw()
    step_fn = jax.jit(make_train_step(apply_fn, opt,
                                      lambda s: jnp.float32(1e-3)))
    state = TrainState.create(variables, opt)
    l0 = lf = None
    for i in range(8):
        state, m = step_fn(state, (x, y))
        l0 = l0 if l0 is not None else float(m["loss"])
        lf = float(m["loss"])
    assert lf < l0


def test_eval_step_confusion_and_iou():
    x, y, variables, apply_fn = _setup("unet", hw=(32, 32), n=4)
    opt = adamw()
    state = TrainState.create(variables, opt)
    eval_fn = jax.jit(make_eval_step(apply_fn, 12, ignore_index=11))
    loss, cm = eval_fn(state, (x, y))
    assert cm.shape == (12, 12)
    # row sums = label histogram of non-ignored pixels
    valid = int(np.sum(np.asarray(y) != 11))
    assert int(np.asarray(cm).sum()) == valid
    iou = iou_from_confusion(cm)
    assert np.all(np.isnan(np.asarray(iou)) | (np.asarray(iou) <= 1.0))


def test_checkpoint_roundtrip_step_exact(tmp_path):
    x, y, variables, apply_fn = _setup("unet", hw=(32, 32), n=4)
    opt = adamw()
    step_fn = jax.jit(make_train_step(apply_fn, opt,
                                      lambda s: jnp.float32(1e-3)))
    state = TrainState.create(variables, opt)
    for _ in range(3):
        state, _ = step_fn(state, (x, y))

    run_dir = str(tmp_path / "checkpoints" / "2026-01-01T00:00:00")
    path = checkpoint_name(run_dir, 3, "best")
    save_checkpoint(path, state, meta={"epoch": 3, "miou": 0.5})

    found = get_weight_path(str(tmp_path / "checkpoints"))
    assert found == path
    assert parse_epoch(found) == 3

    template = TrainState.create(variables, opt)
    restored, meta = load_checkpoint(found, template)
    assert meta["epoch"] == 3

    # continuing from restored must be bit-identical to continuing original
    s1, m1 = step_fn(state, (x, y))
    s2, m2 = step_fn(restored, (x, y))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-7)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_grad_accum_matches_full_batch_on_duplicates():
    """With the batch = two identical halves, each microbatch's BN stats
    equal the full-batch stats, so grad_accum=2 must match the plain step
    numerically (grads averaged, one optimizer update)."""
    from pytorch_camvid_tpu.train import sgd
    x, y, variables, apply_fn = _setup("unet", hw=(32, 32), n=2)
    x2 = jnp.concatenate([x, x]); y2 = jnp.concatenate([y, y])
    # SGD: Adam's step-1 update is ~sign(g), which amplifies benign
    # reduction-order noise (same rationale as the shard_map DP tests)
    opt = sgd()
    lr = lambda s: jnp.float32(1e-3)
    plain = jax.jit(make_train_step(apply_fn, opt, lr, log_grad_norms=False))
    accum = jax.jit(make_train_step(apply_fn, opt, lr, log_grad_norms=False,
                                    grad_accum=2))
    s1 = TrainState.create(variables, opt)
    s2 = TrainState.create(variables, opt)
    s1, m1 = plain(s1, (x2, y2))
    s2, m2 = accum(s2, (x2, y2))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        # f32 reduction-order noise through conv bwd; semantics, not bits
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_grad_accum_trains_end_to_end():
    from pytorch_camvid_tpu.train.loop import TrainConfig, run_training
    from tests.test_loop import _DS
    ds = _DS(8, seed=9)
    cfg = TrainConfig(net="unet", batch_size=4, lr=1e-3, epochs=1,
                      quiet=True, data_parallel=2, grad_accum=2)
    state, history = run_training(cfg, ds, _DS(2, seed=10))
    assert np.isfinite(history[0]["miou"])


def test_backward_prunes_stem_input_gradient():
    """The worst conv shape in the model — the stem's dgrad, measured
    standalone at 5% of roofline (PERF.md backward breakdown) — must not
    exist in the real backward: images are a differentiation leaf, so
    dL/d(images) is pruned. Counts convs in the grad jaxpr (23 fwd +
    22 dgrad + 23 wgrad for UNet's 23 convs) and asserts none produces an
    image-shaped (B,H,W,3) gradient."""
    from pytorch_camvid_tpu.ops.loss import cross_entropy_loss
    B, H, W = 2, 48, 64
    init_fn, apply_fn = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))

    def loss_fn(params, state, x, y):
        out, _ = apply_fn({"params": params, "state": state}, x,
                          train=True, compute_dtype=jnp.bfloat16)
        return cross_entropy_loss(out, y).mean()

    x = jnp.zeros((B, H, W, 3), jnp.bfloat16)
    y = jnp.zeros((B, H, W), jnp.int32)
    jaxpr = str(jax.make_jaxpr(jax.grad(loss_fn))(
        variables["params"], variables["state"], x, y))
    convs = [l for l in jaxpr.splitlines() if "conv_general_dilated" in l]
    assert len(convs) == 68  # 23 + 22 + 23
    stem_dx = [l for l in convs if f"{B},{H},{W},3]" in l]
    assert stem_dx == []


def test_remat_step_matches_plain():
    """Stage rematerialization (jax.checkpoint) is a pure memory/FLOPs
    trade: one f32 train step with remat must produce the same loss,
    gradient-derived update, and BN state as the plain step (identical
    math, recomputed instead of stored)."""
    import pytest

    for model, hw in (("unet", (48, 64)), ("segnet", (32, 32))):
        x, y, variables, apply_fn = _setup(model, hw=hw, n=4)
        opt = adamw(weight_decay=0.0)
        kw = dict(class_weights=None, augment_fn=None,
                  compute_dtype=jnp.float32)
        plain = jax.jit(make_train_step(
            apply_fn, opt, onecycle_lr(1e-3, 10), onecycle_beta1(10), **kw))
        remat = jax.jit(make_train_step(
            apply_fn, opt, onecycle_lr(1e-3, 10), onecycle_beta1(10),
            remat=True, **kw))

        s1, m1 = plain(TrainState.create(variables, opt), (x, y))
        s2, m2 = remat(TrainState.create(variables, opt), (x, y))
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]),
                                                  rel=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=2e-7)
        for a, b in zip(jax.tree_util.tree_leaves(s1.bn_state),
                        jax.tree_util.tree_leaves(s2.bn_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=2e-7)
