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

from pytorch_camvid_tpu.ops.pooling import max_pool_2x2
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


def encoder_stage_halo(params_list, states_list, x: jax.Array,
                       axis_name: str = DATA_AXIS) -> jax.Array:
    """A full encoder stage — k conv3x3+BN+ReLU blocks then 2x2 max pool —
    on an H-sharded (N, H_local, W, C) block, with ONE halo exchange for
    the whole stage (halo widening): instead of a ppermute per conv, each
    shard fetches k boundary rows per side up front and every conv runs
    VALID in H on the shrinking extended block. k-1 fewer ICI hops per
    stage; BN (eval running stats) and ReLU are per-channel elementwise so
    they commute with the halo rows. Pooling windows are 2x2
    non-overlapping, so with H_local even they never straddle a shard
    boundary — the stage is bit-identical to its unsharded form
    (tests/test_spatial_halo.py). Must run inside shard_map.

    SURVEY.md §5.7 stage-level extension (VERDICT r3 #7): promotes the
    single-op halo conv demo to a model-stage path.
    """
    from pytorch_camvid_tpu.ops.conv import BN_EPS

    ndev = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    k = len(params_list)
    assert x.shape[1] % 2 == 0, "H_local must be even for the 2x2 pool"

    top_rows = x[:, :k]
    bot_rows = x[:, -k:]
    halo_top = lax.ppermute(bot_rows, axis_name,
                            [(i, (i + 1) % ndev) for i in range(ndev)])
    halo_bot = lax.ppermute(top_rows, axis_name,
                            [(i, (i - 1) % ndev) for i in range(ndev)])
    halo_top = jnp.where(idx == 0, jnp.zeros_like(halo_top), halo_top)
    halo_bot = jnp.where(idx == ndev - 1, jnp.zeros_like(halo_bot),
                         halo_bot)
    xh = jnp.concatenate([halo_top, x, halo_bot], axis=1)

    for j, (p, s) in enumerate(zip(params_list, states_list)):
        y = lax.conv_general_dilated(
            xh, p["w"].astype(xh.dtype), (1, 1),
            ((0, 0), (1, 1)),  # VALID in H (halo rows supply it), pad-1 W
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + p["b"].astype(y.dtype)
        y = y.astype(jnp.float32)
        inv = lax.rsqrt(s["var"] + BN_EPS) * p["scale"]
        y = (y - s["mean"]) * inv + p["bias"]
        xh = jnp.maximum(y, 0.0).astype(x.dtype)
        # re-assert the global pad-1 zeros: the next conv must see ZERO in
        # the rows beyond the image boundary, but halo widening computed
        # real (conv+BN+ReLU of zero-pad) values there on the edge shards
        d = k - (j + 1)
        if d > 0:
            rows = jnp.arange(xh.shape[1])[None, :, None, None]
            beyond = (((idx == 0) & (rows < d))
                      | ((idx == ndev - 1) & (rows >= xh.shape[1] - d)))
            xh = jnp.where(beyond, jnp.zeros_like(xh), xh)

    # (N, H_local, W, C') after k VALID convs; local 2x2 max pool via the
    # shared op (ADVICE r4 #2: it builds the reduce_window init the one
    # way that keeps the VJP differentiable AND dtype-exact, so a future
    # training-time spatial stage doesn't re-hit the fixed bug)
    return max_pool_2x2(xh)


def make_spatial_stage(mesh: Mesh, axis_name: str = DATA_AXIS):
    """jit'ed H-sharded encoder stage (see encoder_stage_halo): x sharded
    (None, axis, None, None), block params/states replicated, pooled
    output H-sharded."""
    mapped = jax.shard_map(
        partial(encoder_stage_halo, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis_name, None, None)),
        out_specs=P(None, axis_name, None, None),
        check_vma=False,
    )
    return jax.jit(mapped)


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
