"""Parallelism: device meshes, shardings, data-parallel step builders."""

from pytorch_camvid_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding)
from pytorch_camvid_tpu.parallel.data_parallel import (  # noqa: F401
    jit_train_step, jit_eval_step, shard_batch)
