"""Data parallelism over an 8-virtual-device CPU mesh (SURVEY.md §4):
sharded train step equals single-device, metrics psum correctly."""

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.data.synthetic import synthetic_arrays
from pytorch_camvid_tpu.models import get_model
from pytorch_camvid_tpu.parallel import (
    make_mesh, jit_train_step, jit_eval_step, shard_batch)
from pytorch_camvid_tpu.train import (
    TrainState, adamw, make_train_step, make_eval_step)


def _setup(n=8, hw=(32, 32)):
    images, labels = synthetic_arrays(n, hw, 12)
    x = (jnp.asarray(images, jnp.float32) / 255.0 - 0.4) / 0.3
    y = jnp.asarray(labels, jnp.int32)
    init_fn, apply_fn = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    return x, y, variables, apply_fn


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1


def test_dp_train_step_matches_single_device():
    # SGD: the update is linear in the gradient, so single-device and
    # 8-way-DP must agree to float tolerance. (Adam's step-1 update is
    # sign(g), which amplifies reduction-order noise on near-zero grads —
    # not a DP correctness signal.)
    from pytorch_camvid_tpu.train import sgd
    x, y, variables, apply_fn = _setup()
    opt = sgd(momentum=0.9, nesterov=True, weight_decay=1e-4)
    step = make_train_step(apply_fn, opt, lambda s: jnp.float32(1e-3),
                           log_grad_norms=False)

    # single device
    s0 = TrainState.create(variables, opt)
    s0, m0 = jax.jit(step)(s0, (x, y))

    # 8-way data parallel
    mesh = make_mesh()
    sp = TrainState.create(variables, opt)
    pstep = jit_train_step(step, mesh)
    batch = shard_batch((x, y), mesh)
    sp, mp = pstep(sp, batch)

    np.testing.assert_allclose(float(m0["loss"]), float(mp["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # BN running stats must also agree (global-batch statistics = sync BN)
    for a, b in zip(jax.tree.leaves(s0.bn_state),
                    jax.tree.leaves(sp.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_eval_step_confusion_matrix_global():
    x, y, variables, apply_fn = _setup()
    opt = adamw()
    state = TrainState.create(variables, opt)
    eval_fn = make_eval_step(apply_fn, 12, ignore_index=11)

    loss0, cm0 = jax.jit(eval_fn)(state, (x, y))

    mesh = make_mesh()
    peval = jit_eval_step(eval_fn, mesh)
    loss1, cm1 = peval(state, shard_batch((x, y), mesh))
    np.testing.assert_allclose(np.asarray(cm0), np.asarray(cm1))
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-5)


def test_elastic_checkpoint_restore_across_mesh_shapes(tmp_path):
    """A checkpoint saved from a dp=8 run restores onto a dp=4 (and dp=2 +
    grad_accum) mesh and continues with identical numbers on the same
    global batch — the real TPU-pod preemption scenario the reference's
    -resume (train.py:88-93) would face (VERDICT r2 missing #5)."""
    import os
    from pytorch_camvid_tpu.parallel import replicated_sharding
    from pytorch_camvid_tpu.train import sgd
    from pytorch_camvid_tpu.train.checkpoint import (
        save_checkpoint, load_checkpoint)

    x, y, variables, apply_fn = _setup()
    opt = sgd(momentum=0.9, nesterov=True)
    step = make_train_step(apply_fn, opt, lambda s: jnp.float32(1e-3),
                           log_grad_norms=False)
    host_vars = jax.tree.map(np.asarray, variables)

    mesh8 = make_mesh(8)
    s8, _ = jit_train_step(step, mesh8)(
        TrainState.create(host_vars, opt), shard_batch((x, y), mesh8))
    path = os.path.join(str(tmp_path), "1-regular.ckpt.npz")
    save_checkpoint(path, s8, {"epoch": 1})

    # continue on dp=8 (the baseline continuation)
    s8b, _ = load_checkpoint(path, TrainState.create(host_vars, opt),
                             sharding=replicated_sharding(mesh8))
    ref, mref = jit_train_step(step, mesh8)(s8b, shard_batch((x, y), mesh8))

    # restore + continue on dp=4: identical forward AND identical update
    mesh4 = make_mesh(4, devices=jax.devices()[:4])
    s4, meta = load_checkpoint(path, TrainState.create(host_vars, opt),
                               sharding=replicated_sharding(mesh4))
    assert meta["epoch"] == 1
    got, mgot = jit_train_step(step, mesh4)(s4, shard_batch((x, y), mesh4))
    np.testing.assert_allclose(float(mref["loss"]), float(mgot["loss"]),
                               rtol=1e-5)
    # atol 1e-5 like test_dp_train_step_matches_single_device: dp=8 and
    # dp=4 reduce gradients in different orders (float noise, not drift)
    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(got.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # restore on dp=2 with grad_accum=2: runs and stays finite (grad_accum
    # changes BN microbatch statistics by design, so no bit-compare)
    mesh2 = make_mesh(2, devices=jax.devices()[:2])
    ga = make_train_step(apply_fn, opt, lambda s: jnp.float32(1e-3),
                         log_grad_norms=False, grad_accum=2)
    s2, _ = load_checkpoint(path, TrainState.create(host_vars, opt),
                            sharding=replicated_sharding(mesh2))
    s2, m2 = jit_train_step(ga, mesh2)(s2, shard_batch((x, y), mesh2))
    assert np.isfinite(float(m2["loss"]))
