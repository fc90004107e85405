"""Spatial partitioning with halo exchange — conv-world context parallelism.

SURVEY.md §5.7: the reference has no sequence axis; the TPU-native analogue
of ring/context parallelism for convnets is sharding the image height across
the mesh and exchanging 1-row halos between neighbor devices for each 3x3
conv. This lets resolutions whose activations exceed one chip's HBM train
across a slice — a designed-for extension beyond reference parity.

``conv3x3_halo`` runs inside shard_map: each shard holds (H/ndev, W, C),
sends its boundary rows to its neighbors over ICI (lax.ppermute), pads the
global top/bottom edges with zeros, and convolves VALID in H / SAME in W —
bit-identical to the unsharded pad-1 conv (asserted in tests on the
8-virtual-device mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from pytorch_camvid_tpu.parallel.mesh import DATA_AXIS


def conv3x3_halo(x: jax.Array, w: jax.Array, axis_name: str = DATA_AXIS
                 ) -> jax.Array:
    """Pad-1 conv3x3 on an H-sharded (N, H_local, W, C) block. Must run
    inside shard_map over ``axis_name``."""
    ndev = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    # exchange boundary rows with neighbors (rings over ICI)
    top_row = x[:, :1]        # goes to the previous device (as its bottom halo)
    bot_row = x[:, -1:]       # goes to the next device (as its top halo)
    # receive: my top halo = previous device's bottom row
    halo_top = lax.ppermute(bot_row, axis_name,
                            [(i, (i + 1) % ndev) for i in range(ndev)])
    # my bottom halo = next device's top row
    halo_bot = lax.ppermute(top_row, axis_name,
                            [(i, (i - 1) % ndev) for i in range(ndev)])
    # zero the wrapped-around halos at the global edges (pad-1 semantics)
    halo_top = jnp.where(idx == 0, jnp.zeros_like(halo_top), halo_top)
    halo_bot = jnp.where(idx == ndev - 1, jnp.zeros_like(halo_bot),
                         halo_bot)

    xh = jnp.concatenate([halo_top, x, halo_bot], axis=1)
    return lax.conv_general_dilated(
        xh, w.astype(xh.dtype), (1, 1),
        ((0, 0), (1, 1)),  # VALID in H (halos supplied), pad-1 in W
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def make_spatial_conv(mesh: Mesh, axis_name: str = DATA_AXIS):
    """jit'ed H-sharded conv: x sharded (None, axis, None, None), w
    replicated, output H-sharded."""
    mapped = jax.shard_map(
        partial(conv3x3_halo, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None), P()),
        out_specs=P(None, axis_name, None, None),
        check_vma=False,
    )
    return jax.jit(mapped)
