"""Serving predictor: batching, padding, resize, checkpoint loading."""

import numpy as np
import jax

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
