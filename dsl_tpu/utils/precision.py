"""Mixed-precision helpers: bf16 compute with f32 master weights.

The reference's optional fp16 path (``Fp16OptimizerHook`` + ``@force_fp32``
guards, SURVEY.md §2.3) maps to the standard JAX pattern: the optimizer holds
f32 parameters; inside the jitted step the variables and images are cast to
bfloat16 for the conv/MXU-heavy forward (XLA fuses the casts into the first
consumers), and head outputs are cast back to f32 before loss / box decode —
exactly where the reference puts its ``force_fp32`` decorators
(``fcos_head.py:170,340``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_floating(tree: Any, dtype) -> Any:
    """Cast floating leaves of a pytree to ``dtype`` (ints/bools untouched)."""
    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)


def to_compute(variables: dict, images, compute_dtype) -> tuple:
    if compute_dtype is None:
        return variables, images
    return (cast_floating(variables, compute_dtype),
            images.astype(compute_dtype))


def outputs_to_f32(outputs):
    """Cast (possibly nested tuples of) arrays to float32 (force_fp32)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), outputs)
