"""Activation function registry.

JAX counterpart of ``/root/reference/src/rl8/nn/modules/activations.py``
(same 18-entry registry). Activations are plain callables (the flax
idiom) rather than module instances.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["ACTIVATIONS", "SquaredReLU", "get_activation", "squared_relu"]


def squared_relu(x: jax.Array) -> jax.Array:
    """ReLU squared, from `Primer <https://arxiv.org/abs/2109.08668>`_."""
    return jnp.square(jax.nn.relu(x))


class SquaredReLU:
    """Module-style wrapper over :func:`squared_relu`, mirroring the
    reference's class form
    (``/root/reference/src/rl8/nn/modules/activations.py:12-48``)."""

    def __call__(self, x: jax.Array) -> jax.Array:
        return squared_relu(x)


def _hard_shrink(x: jax.Array, lambd: float = 0.5) -> jax.Array:
    return jnp.where(jnp.abs(x) > lambd, x, 0.0)


def _identity(x: jax.Array) -> jax.Array:
    return x


ACTIVATIONS: dict[str, Callable[..., jax.Array]] = {
    "elu": jax.nn.elu,
    # approximate=False: the reference's torch ``nn.GELU`` computes the
    # exact erf form, not jax's default tanh approximation.
    "gelu": functools.partial(jax.nn.gelu, approximate=False),
    "hard_shrink": _hard_shrink,
    "hard_sigmoid": jax.nn.hard_sigmoid,
    "hard_swish": jax.nn.hard_silu,
    "hard_tanh": jax.nn.hard_tanh,
    "identity": _identity,
    "leaky_relu": jax.nn.leaky_relu,
    "log_sigmoid": jax.nn.log_sigmoid,
    "log_softmax": jax.nn.log_softmax,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "selu": jax.nn.selu,
    "sigmoid": jax.nn.sigmoid,
    "squared_relu": squared_relu,
    "softmax": jax.nn.softmax,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
}


def get_activation(name: str, /, **params: Any) -> Callable[[jax.Array], jax.Array]:
    """Return an activation callable by its ``name``."""
    fn = ACTIVATIONS[name]
    if params:
        return lambda x: fn(x, **params)
    return fn
