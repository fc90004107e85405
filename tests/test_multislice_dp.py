"""Multi-slice data parallelism (SURVEY.md §2.3 DCN extension): a
('slice' x 'data') mesh — gradients reduce hierarchically (ICI within a
slice, DCN across) — must train identically to a single device."""

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.data.synthetic import synthetic_arrays
from pytorch_camvid_tpu.models import get_model
from pytorch_camvid_tpu.parallel import jit_train_step, shard_batch
from pytorch_camvid_tpu.parallel.mesh import make_multislice_mesh
from pytorch_camvid_tpu.train import TrainState, sgd, make_train_step


def test_multislice_dp_matches_single_device():
    images, labels = synthetic_arrays(8, (32, 32), 12)
    x = (jnp.asarray(images, jnp.float32) / 255.0 - 0.4) / 0.3
    y = jnp.asarray(labels, jnp.int32)
    init_fn, apply_fn = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    opt = sgd(momentum=0.9, nesterov=True, weight_decay=1e-4)
    step = make_train_step(apply_fn, opt, lambda s: jnp.float32(1e-3),
                           log_grad_norms=False)

    s0 = TrainState.create(variables, opt)
    s0, m0 = jax.jit(step)(s0, (x, y))

    mesh = make_multislice_mesh(n_slice=2, n_data=4)
    sp = TrainState.create(variables, opt)
    pstep = jit_train_step(step, mesh)
    sp, mp = pstep(sp, shard_batch((x, y), mesh))

    np.testing.assert_allclose(float(m0["loss"]), float(mp["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
