"""Explicit shard_map DP must agree with the inferred-collective jit path
and with single-device execution (legacy/train_tpu.py equivalence)."""

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.data.synthetic import synthetic_arrays
from pytorch_camvid_tpu.models import get_model
from pytorch_camvid_tpu.parallel import make_mesh, shard_batch
from pytorch_camvid_tpu.parallel.mesh import DATA_AXIS
from pytorch_camvid_tpu.parallel.shard_map_dp import (
    shard_map_train_step, shard_map_eval_step)
from pytorch_camvid_tpu.train import (
    TrainState, sgd, make_train_step, make_eval_step)
from pytorch_camvid_tpu.train.schedules import warmup_then_multistep


def test_shard_map_matches_single_device():
    images, labels = synthetic_arrays(8, (32, 32), 12)
    x = (jnp.asarray(images, jnp.float32) / 255.0 - 0.4) / 0.3
    y = jnp.asarray(labels, jnp.int32)
    init_fn, apply_fn = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    opt = sgd(momentum=0.9, nesterov=True, weight_decay=1e-4)
    sched = warmup_then_multistep(0.01, 10, (100, 150), 5)

    # single device (no axis name, full batch)
    step0 = make_train_step(apply_fn, opt, sched, log_grad_norms=False)
    s0 = TrainState.create(variables, opt)
    s0, m0 = jax.jit(step0)(s0, (x, y))

    # 8-way shard_map with explicit collectives
    mesh = make_mesh()
    stepp = make_train_step(apply_fn, opt, sched, axis_name=DATA_AXIS,
                            log_grad_norms=False)
    ptrain = shard_map_train_step(stepp, mesh)
    sp = TrainState.create(variables, opt)
    sp, mp = ptrain(sp, shard_batch((x, y), mesh))

    np.testing.assert_allclose(float(m0["loss"]), float(mp["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # sync-BN moments must match global-batch statistics
    for a, b in zip(jax.tree.leaves(s0.bn_state),
                    jax.tree.leaves(sp.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_shard_map_eval_psum():
    images, labels = synthetic_arrays(8, (32, 32), 12)
    x = (jnp.asarray(images, jnp.float32) / 255.0 - 0.4) / 0.3
    y = jnp.asarray(labels, jnp.int32)
    init_fn, apply_fn = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    opt = sgd()
    state = TrainState.create(variables, opt)

    ev0 = make_eval_step(apply_fn, 12, ignore_index=11)
    loss0, cm0 = jax.jit(ev0)(state, (x, y))

    mesh = make_mesh()
    evp = make_eval_step(apply_fn, 12, ignore_index=11, axis_name=DATA_AXIS)
    peval = shard_map_eval_step(evp, mesh)
    loss1, cm1 = peval(state, shard_batch((x, y), mesh))
    np.testing.assert_allclose(np.asarray(cm0), np.asarray(cm1))
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-5)
