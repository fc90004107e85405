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


@pytest.mark.slow  # int8 convs have no fast CPU emitter (docs/TESTING.md)
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


def test_predictor_bucketed_resize_bounds_jit_cache():
    """Shape policy (VERDICT r3 #8): after _max_static_resize distinct
    source sizes, further sizes take the BUCKETED dynamic-extent resize —
    one compiled program per 64px bucket, so a long-lived server's jit
    cache stays bounded however many sizes arrive. Predictions for
    bucketed sizes must agree with a fresh predictor that handles the
    same size through the exact static path."""
    rng = np.random.default_rng(3)
    init_fn, _ = get_model("unet", 3, 12)
    variables = init_fn(jax.random.PRNGKey(0))
    p = Predictor("unet", variables, batch_size=2, image_hw=(48, 64))

    sizes = [(37, 53), (40, 60), (52, 70), (64, 90), (70, 100),
             (75, 110), (80, 115), (90, 120), (33, 44), (96, 128)]
    for i, (h, w) in enumerate(sizes):
        imgs = rng.integers(0, 256, size=(2, h, w, 3), dtype=np.uint8)
        masks = p.predict(imgs)
        assert masks.shape == (2, 48, 64)
        if i >= p._max_static_resize:
            # bucketed path: agree with the exact static path on nearly
            # every pixel (the resize differs only in sub-ULP summation
            # order; argmax can flip on near-tie boundary pixels)
            fresh = Predictor("unet", variables, batch_size=2,
                              image_hw=(48, 64))
            want = fresh.predict(imgs)
            agree = (masks == want).mean()
            assert agree > 0.99, ((h, w), agree)
    # the static-specialization set is frozen at the cap; everything else
    # went through the shared bucket programs
    assert len(p._static_resize_shapes) == p._max_static_resize
