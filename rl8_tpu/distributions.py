"""Action distributions.

Native JAX counterpart of ``/root/reference/src/rl8/distributions.py``.
Instead of wrapping ``torch.distributions``, the math is implemented
directly with ``jax.nn``/``jnp`` primitives so everything fuses under
jit. Sampling takes an explicit PRNG key (JAX convention) rather than
using global RNG state.

Semantics preserved from the reference:

- spec-based default dispatch (``distributions.py:53-73``):
  ``Discrete`` -> :class:`Categorical`, ``Unbounded`` -> :class:`Normal`;
- ``logp``/``entropy`` reduce over the last (action-component) axis with
  ``keepdims`` (``distributions.py:112-122``) so outputs are ``[B, 1]``;
- :class:`SquashedNormal`'s clamped-atanh log-prob and
  ``NotImplementedError`` entropy (``distributions.py:147-170``).
"""

from __future__ import annotations

import math
from abc import ABC, abstractmethod
from typing import Any

import jax
import jax.numpy as jnp

from .specs import Discrete, Spec, Unbounded, assert_1d_spec

__all__ = ["Distribution", "Categorical", "Normal", "SquashedNormal"]

# Host-side constant: computing this with jnp at import time would
# initialize the XLA backend, breaking jax.distributed.initialize()
# for multi-host users who import rl8_tpu first.
_LOG_2PI = math.log(2.0 * math.pi)


class Distribution(ABC):
    """Policy component defining a probability distribution over a feature
    set from a model (``/root/reference/src/rl8/distributions.py:18-95``).

    Args:
        features: Mapping of feature names to arrays from the model's
            forward pass (e.g. ``{"logits": ...}`` or
            ``{"mean": ..., "log_std": ...}``).
        model: Model for parameterizing the distribution; optional, kept
            for custom distributions that need model components.

    """

    features: dict[str, jax.Array]
    model: Any

    def __init__(self, features: dict[str, jax.Array], model: Any = None, /) -> None:
        self.features = features
        self.model = model

    @staticmethod
    def default_dist_cls(action_spec: Spec, /) -> type["Distribution"]:
        """Return a default distribution given an action spec
        (``distributions.py:53-73``)."""
        assert_1d_spec(action_spec)
        if isinstance(action_spec, Discrete):
            return Categorical
        if isinstance(action_spec, Unbounded):
            return Normal
        raise TypeError(
            f"Action spec {action_spec} has no default distribution support."
        )

    @abstractmethod
    def deterministic_sample(self) -> Any:
        """Return the distribution's deterministic (mode) sample."""

    @abstractmethod
    def entropy(self) -> jax.Array:
        """Compute the distribution's entropy, shape ``[B, 1]``."""

    @abstractmethod
    def logp(self, samples: Any) -> jax.Array:
        """Compute the log probability of ``samples``, shape ``[B, 1]``."""

    @abstractmethod
    def sample(self, key: jax.Array) -> Any:
        """Draw a random sample using the given PRNG key."""


class Categorical(Distribution):
    """Categorical (discrete) distribution over per-component logits.

    ``features["logits"]`` has shape ``[B, A, n]`` — ``A`` independent
    action components, each with ``n`` categories. Samples are ``[B, A]``
    int32 (``/root/reference/src/rl8/distributions.py:125-132``).

    Examples:
        >>> import jax.numpy as jnp
        >>> from rl8_tpu.distributions import Categorical
        >>> dist = Categorical({"logits": jnp.array([[[0.0, 9.0, 0.0]]])})
        >>> dist.deterministic_sample().tolist()
        [[1]]
        >>> float(dist.logp(jnp.array([[1]]))[0, 0]) > -1e-3
        True

    """

    @property
    def _logits(self) -> jax.Array:
        return self.features["logits"]

    def deterministic_sample(self) -> jax.Array:
        return jnp.argmax(self._logits, axis=-1).astype(jnp.int32)

    def entropy(self) -> jax.Array:
        logp = jax.nn.log_softmax(self._logits, axis=-1)
        ent = -jnp.sum(jnp.exp(logp) * logp, axis=-1)
        return jnp.sum(ent, axis=-1, keepdims=True)

    def logp(self, samples: jax.Array) -> jax.Array:
        logp = jax.nn.log_softmax(self._logits, axis=-1)
        # One-hot select instead of take_along_axis: TPUs execute the
        # row gather serially (~11 ns/row; its scatter-add backward is
        # worse) — together they dominated the whole custom-model PPO
        # update. The where-select is a dense VPU op that fuses away,
        # and its backward is a dense broadcast. ``where`` (not
        # multiply) so -inf masked logits can't produce 0 * -inf NaNs.
        n = logp.shape[-1]
        onehot = (
            samples[..., None].astype(jnp.int32)
            == jnp.arange(n, dtype=jnp.int32)
        )
        chosen = jnp.sum(
            jnp.where(onehot, logp, jnp.zeros((), logp.dtype)), axis=-1
        )
        return jnp.sum(chosen, axis=-1, keepdims=True)

    def sample(self, key: jax.Array) -> jax.Array:
        return jax.random.categorical(key, self._logits, axis=-1).astype(jnp.int32)


class Normal(Distribution):
    """Diagonal normal (gaussian) distribution.

    ``features["mean"]``/``features["log_std"]`` have shape ``[B, A]``
    (``/root/reference/src/rl8/distributions.py:135-144``).
    """

    @property
    def _mean(self) -> jax.Array:
        return self.features["mean"]

    @property
    def _scale(self) -> jax.Array:
        return jnp.exp(self.features["log_std"])

    def deterministic_sample(self) -> jax.Array:
        return self._mean

    def entropy(self) -> jax.Array:
        ent = 0.5 * (1.0 + _LOG_2PI) + self.features["log_std"]
        return jnp.sum(ent, axis=-1, keepdims=True)

    def _base_logp(self, samples: jax.Array) -> jax.Array:
        var = jnp.square(self._scale)
        return (
            -jnp.square(samples - self._mean) / (2.0 * var)
            - self.features["log_std"]
            - 0.5 * _LOG_2PI
        )

    def logp(self, samples: jax.Array) -> jax.Array:
        return jnp.sum(self._base_logp(samples), axis=-1, keepdims=True)

    def sample(self, key: jax.Array) -> jax.Array:
        noise = jax.random.normal(key, self._mean.shape, dtype=self._mean.dtype)
        return self._mean + self._scale * noise


class SquashedNormal(Normal):
    """Squashed normal such that samples are always within [-1, 1]
    (``/root/reference/src/rl8/distributions.py:147-170``)."""

    def deterministic_sample(self) -> jax.Array:
        return jnp.tanh(super().deterministic_sample())

    def entropy(self) -> jax.Array:
        raise NotImplementedError(
            f"{self.__class__.__name__} has no closed-form entropy;"
            " train with the entropy coefficient set to `0`."
        )

    def logp(self, samples: jax.Array) -> jax.Array:
        eps = float(jnp.finfo(jnp.asarray(samples).dtype).eps)
        clipped = jnp.clip(samples, -1.0 + eps, 1.0 - eps)
        # atanh via the log1p identity, matching the reference's clamping.
        inverted = 0.5 * (jnp.log1p(clipped) - jnp.log1p(-clipped))
        logp = jnp.sum(
            jnp.clip(self._base_logp(inverted), -100.0, 100.0),
            axis=-1,
            keepdims=True,
        )
        # The log-det term uses the clipped value too: raw samples a hair
        # outside [-1, 1] (bf16 round trips, replayed data) would make
        # 1 - s^2 negative and the log NaN.
        logp -= jnp.sum(
            jnp.log(1.0 - jnp.square(clipped) + eps), axis=-1, keepdims=True
        )
        return logp

    def sample(self, key: jax.Array) -> jax.Array:
        return jnp.tanh(super().sample(key))
