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
