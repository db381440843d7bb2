"""Optimizer helpers.

:func:`flatten_optimizer` runs a gradient transformation over a single
flattened parameter vector instead of the parameter pytree. On TPU the
per-leaf optimizer math (global-norm clip + adam on ~a dozen small
tensors) lowers to ~100 tiny kernels costing several milliseconds per
update inside the train step; on one flat vector it's a handful of
well-shaped vector ops. Mathematically equivalent for elementwise
transformations (sgd/adam/adamw/...) and for global-norm clipping —
though the global norm sums in a different floating-point order (one
monolithic reduction vs per-leaf partials), so results agree to
reduction-order rounding rather than bit-for-bit, and mixed-dtype
param trees are promoted to a common dtype by ``ravel_pytree``. NOT
valid for optimizers whose behavior depends on parameter structure
(e.g. per-layer scaling rules) — gate with
``AlgorithmConfig.flatten_optimizer``.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

__all__ = ["flatten_optimizer"]


def _make_unravel(params_template: Any):
    """Build the flat-vector -> pytree inverse from the template's
    SHAPES only (works with ``jax.ShapeDtypeStruct`` leaves, so callers
    can derive the template via ``eval_shape`` without running the
    parameter init eagerly). Mirrors ``ravel_pytree``'s layout: leaves
    raveled in tree order, cast back to their own dtypes."""
    leaves, treedef = jax.tree_util.tree_flatten(params_template)
    shapes = [tuple(leaf.shape) for leaf in leaves]
    dtypes = [leaf.dtype for leaf in leaves]
    sizes = [math.prod(s) for s in shapes]
    offsets = np.cumsum([0, *sizes])

    def unravel(flat: jax.Array) -> Any:
        parts = [
            flat[offsets[i] : offsets[i + 1]]
            .reshape(shapes[i])
            .astype(dtypes[i])
            for i in range(len(sizes))
        ]
        return jax.tree_util.tree_unflatten(treedef, parts)

    return unravel


def flatten_optimizer(
    inner: optax.GradientTransformation, params_template: Any
) -> optax.GradientTransformation:
    """Wrap ``inner`` to operate on a flat parameter/gradient vector.

    Args:
        inner: The transformation to wrap (e.g. ``chain(clip, adam)``).
        params_template: A params pytree fixing the flatten/unflatten
            structure (shapes must match at ``update`` time). May be a
            tree of ``jax.ShapeDtypeStruct``\\ s — only shapes/dtypes
            are read.

    """
    unravel = _make_unravel(params_template)

    def init(params: Any) -> optax.OptState:
        flat, _ = ravel_pytree(params)
        return inner.init(flat)

    def update(
        grads: Any, state: optax.OptState, params: Any = None
    ) -> tuple[Any, optax.OptState]:
        flat_grads, _ = ravel_pytree(grads)
        flat_params = ravel_pytree(params)[0] if params is not None else None
        flat_updates, state = inner.update(flat_grads, state, flat_params)
        return unravel(flat_updates), state

    return optax.GradientTransformation(init, update)
