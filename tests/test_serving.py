"""Serving predictor: batching, padding, resize, checkpoint loading."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from pytorch_camvid_tpu.models import get_model
from pytorch_camvid_tpu.serving import Predictor


def test_predictor_batches_and_resizes():
    init_fn, _ = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    p = Predictor("unet", variables, batch_size=2, image_hw=(48, 64),
                  use_pallas=False)
    # 5 images (2 full batches + padded remainder), odd input size
    imgs = np.random.default_rng(0).integers(
        0, 256, size=(5, 37, 53, 3), dtype=np.uint8)
    masks = p.predict(imgs)
    assert masks.shape == (5, 48, 64)
    assert masks.dtype == np.uint8
    assert masks.max() < 12

    # deterministic: same input -> same output
    masks2 = p.predict(imgs)
    np.testing.assert_array_equal(masks, masks2)

    # empty input
    empty = p.predict(np.zeros((0, 48, 64, 3), np.uint8))
    assert empty.shape == (0, 48, 64)


@pytest.mark.parametrize("net", ["unet", "segnet"])
def test_predictor_mesh_dp_matches_single_device(net):
    """Batch-sharded serving over the 8-device mesh is bit-identical to
    the single-device predictor: eval-mode BN makes every image's math
    independent, so sharding the batch changes nothing but placement."""
    init_fn, _ = get_model(net, 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    imgs = np.random.default_rng(1).integers(
        0, 256, size=(10, 48, 64, 3), dtype=np.uint8)

    single = Predictor(net, variables, batch_size=8, image_hw=(48, 64),
                       compute_dtype=jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    dp = Predictor(net, variables, batch_size=8, image_hw=(48, 64),
                   compute_dtype=jnp.float32, mesh=mesh)

    ref = single.predict(imgs)
    out = dp.predict(imgs)
    np.testing.assert_array_equal(ref, out)

    # the sharded forward really is sharded: a compiled-batch input lands
    # split over the mesh devices
    dev = jax.device_put(imgs[:8],
                         dp._batch_sharding)
    assert len(dev.sharding.device_set) == 8

    # int8 PTQ under the mesh: same calibration images -> identical amax
    # (per-tensor max is shard-invariant) -> identical class maps
    single.quantize_int8(imgs, max_batches=1)
    dp.quantize_int8(imgs, max_batches=1)
    np.testing.assert_array_equal(single.predict(imgs), dp.predict(imgs))


def test_predictor_mesh_batch_divisibility_error():
    init_fn, _ = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    with pytest.raises(ValueError, match="divide"):
        Predictor("unet", variables, batch_size=6, image_hw=(48, 64),
                  mesh=mesh)
