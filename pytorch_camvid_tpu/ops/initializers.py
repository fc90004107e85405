"""Parameter initializers reproducing torch.nn.Conv2d defaults.

The reference never customizes init, so its recipe depends on PyTorch's
defaults (models/unet.py:11, models/segnet.py:8):

- weight: kaiming_uniform(a=sqrt(5)) which reduces to
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in = cin*kh*kw,
- bias:   U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

BatchNorm init is scale=1, bias=0, running_mean=0, running_var=1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv_kernel_init(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """HWIO conv kernel, torch-default uniform init.

    shape = (kh, kw, cin, cout); fan_in = kh*kw*cin.
    """
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def conv_bias_init(key: jax.Array, cout: int, fan_in: int,
                   dtype=jnp.float32) -> jax.Array:
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, (cout,), dtype, minval=-bound, maxval=bound)
