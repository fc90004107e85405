"""Model summary (reference: utils.visualize_network at utils.py:10-13 adds
a TB graph; the JAX analogue is a parameter/shape table plus the jaxpr,
since XLA programs don't map to a module graph)."""

from __future__ import annotations

from typing import Any

import numpy as np
import jax


def count_params(params: Any) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def summarize_model(variables, name: str = "model") -> str:
    """Per-stage parameter table, printable and TB-text-loggable."""
    lines = [f"{name}: {count_params(variables['params']):,} parameters"]
    for stage, blocks in variables["params"].items():
        n = sum(int(np.prod(p.shape))
                for blk in blocks for p in blk.values())
        shapes = ", ".join(
            "x".join(map(str, blk["w"].shape)) for blk in blocks)
        lines.append(f"  {stage:12s} {n:>12,}  convs: {shapes}")
    return "\n".join(lines)


def visualize_network(logger, variables, name: str = "model"):
    """TB surface parity for utils.visualize_network — logs the summary as
    text (graph tracing has no XLA equivalent)."""
    text = summarize_model(variables, name)
    if getattr(logger, "_writer", None) is not None:
        logger._writer.add_text(f"{name}/summary", f"```\n{text}\n```")
    return text


def dump_program(jitted_fn, args, path: str) -> str:
    """Write a jitted function's StableHLO module text to ``path``.

    The TPU-native analogue of the reference's ``visualize_network`` TB
    ``add_graph`` (utils.py:10-13, called at train.py:97-98): under jit
    the *compiled program* is the model graph — every conv, BN, collective
    and fusion boundary, in the form the hardware actually runs. Costs one
    trace+lower (no backend compile); args may be concrete arrays or
    ``jax.ShapeDtypeStruct``s."""
    text = jitted_fn.lower(*args).as_text()
    with open(path, "w") as f:
        f.write(text)
    return path
