"""Runtime setup helpers shared by all entry points."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    """Enable JAX's persistent compilation cache (XLA compiles of the
    360x480 train step take 1-3 minutes on the tunneled TPU; the cache cuts
    warm starts to seconds). Safe to call multiple times."""
    import jax
    path = path or os.environ.get(
        "PCT_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "pytorch_camvid_tpu_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement
