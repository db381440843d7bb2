"""Base policy definitions.

Counterpart of ``/root/reference/src/rl8/policies/_base.py``. A policy is
the union of a model and an action distribution; it is the *only*
sampling path (collect, train, validate, and serving all go through
``sample``). Unlike the reference's stateful ``sample`` (which toggles
grad mode and train/eval mode, ``policies/_feedforward.py:140-175``),
sampling here is a pure function of ``(params, batch, key)`` — gradient
and precision behavior are decided by the caller's transform (``jax.grad``
etc.), which is the JAX-native equivalent.
"""

from __future__ import annotations

from typing import Any, Generic, TypeVar

import jax

from ..distributions import Distribution
from ..specs import Spec

__all__ = ["GenericPolicyBase"]

_Model = TypeVar("_Model")


class GenericPolicyBase(Generic[_Model]):
    """The base policy, bound to a particular model type."""

    #: Action distribution class instantiated from model features.
    distribution_cls: type[Distribution]

    #: Underlying flax model (static module config; parameters live in
    #: the algorithm/train state).
    model: _Model

    #: Model config kwargs used at construction.
    model_config: dict[str, Any]

    @property
    def action_spec(self) -> Spec:
        """Spec defining the policy's action distribution outputs."""
        return self.model.action_spec  # type: ignore[attr-defined]

    @property
    def observation_spec(self) -> Spec:
        """Spec defining the policy's model inputs."""
        return self.model.observation_spec  # type: ignore[attr-defined]

    def init_params(self, key: jax.Array, /) -> Any:
        raise NotImplementedError
