"""Halo-exchange spatially-partitioned conv == unsharded conv (SURVEY §5.7
designed-for extension), on the 8-virtual-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from pytorch_camvid_tpu.parallel.mesh import make_mesh, DATA_AXIS
from pytorch_camvid_tpu.parallel.spatial import make_spatial_conv


def test_halo_conv_matches_unsharded():
    rng = np.random.default_rng(0)
    # H = 48 shards 6 rows per device across 8 devices
    x = jnp.asarray(rng.normal(size=(2, 48, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 4)).astype(np.float32))

    want = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    mesh = make_mesh()
    conv = make_spatial_conv(mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, DATA_AXIS)))
    got = conv(xs, w)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    # output stays H-sharded (no implicit gather); specs normalize
    # trailing Nones
    assert tuple(got.sharding.spec)[:2] == (None, DATA_AXIS)
