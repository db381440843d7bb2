"""Base algorithm definitions.

Counterpart of ``/root/reference/src/rl8/algorithms/_base.py``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import asdict
from typing import Any, Generic, TypeVar

from ..data import AlgorithmHparams, CollectStats, StepStats
from ..env import Env
from ..utils import memory_stats

__all__ = ["GenericAlgorithmBase"]

_Hparams = TypeVar("_Hparams", bound=AlgorithmHparams)
_State = TypeVar("_State")
_Policy = TypeVar("_Policy")


class GenericAlgorithmBase(ABC, Generic[_Hparams, _State, _Policy]):
    """Generic algorithm ABC tying hparam/state/policy type params
    (``/root/reference/src/rl8/algorithms/_base.py:27-158``)."""

    #: Environment being simulated (one object = ``num_envs`` instances).
    env: Env

    #: Frozen, validated hyperparameters (static w.r.t. jit).
    hparams: _Hparams

    #: Policy (model + action distribution); parameters live in ``state``.
    policy: _Policy

    #: Dynamic train state pytree threaded through the jitted programs.
    state: _State

    @property
    def horizons_per_env_reset(self) -> int:
        """Convenience passthrough used by trainers."""
        return self.hparams.horizons_per_env_reset

    @property
    def params(self) -> dict[str, Any]:
        """Flat dict of algorithm parameters for experiment tracking
        (``algorithms/_base.py:99-132``)."""
        out: dict[str, Any] = {
            "env_cls": self.env.__class__.__name__,
            "model_cls": self.policy.model.__class__.__name__,  # type: ignore[attr-defined]
            "distribution_cls": self.policy.distribution_cls.__name__,  # type: ignore[attr-defined]
        }
        out.update(asdict(self.hparams))
        return {k: (v if v is not None else "None") for k, v in out.items()}

    def memory_stats(self) -> dict[str, Any]:
        """Return memory stats for the training backend."""
        return memory_stats()

    @abstractmethod
    def collect(
        self, *, env_config: None | dict[str, Any] = None, deterministic: bool = False
    ) -> CollectStats:
        ...

    @abstractmethod
    def step(self) -> StepStats:
        ...

    @abstractmethod
    def validate(self) -> None:
        ...
