"""Recurrent policy.

Counterpart of ``/root/reference/src/rl8/policies/_recurrent.py``. Same
pure-function stance as :class:`rl8_tpu.policies.Policy`; recurrent
states are threaded explicitly: ``sample`` takes states of batch shape
``[B, ...]`` and returns updated states of the same shape alongside
outputs of batch shape ``[B * T, ...]``.
"""

from __future__ import annotations

import pickle
from os import PathLike
from typing import Any

import jax

from ..data import DataKeys
from ..distributions import Distribution
from ..models import RecurrentModel, RecurrentModelFactory
from ..specs import Composite, Spec
from ._base import GenericPolicyBase

__all__ = ["RecurrentPolicy"]


class RecurrentPolicy(GenericPolicyBase[RecurrentModel]):
    """The union of a recurrent model and an action distribution
    (``/root/reference/src/rl8/policies/_recurrent.py:20-186``).

    Args:
        observation_spec: Spec defining environment observations and model
            forward inputs.
        action_spec: Spec defining action distribution outputs and
            environment inputs.
        model: Model instance to use. Mutually exclusive with ``model_cls``.
        model_cls: Model class or factory to use.
        model_config: Model class kwargs.
        distribution_cls: Action distribution class; inferred from
            ``action_spec`` when not provided.

    """

    def __init__(
        self,
        observation_spec: Spec,
        action_spec: Spec,
        /,
        *,
        model: None | RecurrentModel = None,
        model_cls: None | RecurrentModelFactory = None,
        model_config: None | dict[str, Any] = None,
        distribution_cls: None | type[Distribution] = None,
    ) -> None:
        self.model_config = model_config or {}
        if model and model_cls:
            raise ValueError(
                "`model` and `model_cls` args are mutually exclusive."
                " Provide one or the other, but not both."
            )
        if model is None:
            model_cls = model_cls or RecurrentModel.default_model_cls(
                observation_spec, action_spec
            )
            self.model = model_cls(observation_spec, action_spec, **self.model_config)
        else:
            self.model = model
        self.distribution_cls = distribution_cls or Distribution.default_dist_cls(
            action_spec
        )

    @property
    def state_spec(self) -> Composite:
        """Spec defining the recurrent model states
        (``policies/_recurrent.py:180-186``)."""
        return self.model.state_spec

    def init_states(self, n: int, /) -> Any:
        """Return initial recurrent states for ``n`` parallel environments
        (``policies/_recurrent.py:64-66``)."""
        return self.model.init_states(n)

    def init_params(self, key: jax.Array, /) -> Any:
        """Initialize model parameters with spec-derived dummy inputs."""
        batch = {DataKeys.OBS: self.observation_spec.zero((1, 1))}
        states = self.state_spec.zero((1,))
        return self.model.init(key, batch, states)["params"]

    def sample(
        self,
        params: Any,
        batch: Any,
        states: Any,
        /,
        *,
        key: None | jax.Array = None,
        deterministic: bool = False,
        return_actions: bool = True,
        return_logp: bool = False,
        return_values: bool = False,
    ) -> tuple[dict[str, Any], Any]:
        """Sample the policy: run the recurrent forward pass and optionally
        draw actions/log-probs/values (``policies/_recurrent.py:68-164``).

        Args:
            params: Model parameters.
            batch: Pytree with leading ``[B, T, ...]`` dims.
            states: Recurrent states with leading ``[B, ...]`` dims.
            key: PRNG key; required when ``return_actions`` and not
                ``deterministic``.
            deterministic: Whether to sample deterministically.
            return_actions / return_logp / return_values: Optional outputs.

        Returns:
            ``(out, new_states)`` where ``out`` has batch shape
            ``[B * T, ...]`` and ``new_states`` has batch shape ``[B, ...]``.

        """
        (features, values), new_states = self.model.apply(
            {"params": params}, batch, states
        )
        out: dict[str, Any] = {DataKeys.FEATURES: features}
        if return_actions:
            dist = self.distribution_cls(features, self.model)
            if deterministic:
                actions = dist.deterministic_sample()
            else:
                if key is None:
                    raise ValueError(
                        "A PRNG `key` is required for stochastic sampling."
                    )
                actions = dist.sample(key)
            out[DataKeys.ACTIONS] = actions
            if return_logp:
                out[DataKeys.LOGP] = dist.logp(actions)
        if return_values:
            out[DataKeys.VALUES] = values
        return out, new_states

    def save(self, path: str | PathLike[str], params: Any, /) -> None:
        """Serialize the policy (module config + params) to ``path``."""
        with open(path, "wb") as f:
            pickle.dump({"policy": self, "params": jax.device_get(params)}, f)

    @staticmethod
    def load(path: str | PathLike[str], /) -> tuple["RecurrentPolicy", Any]:
        """Load a policy and its params saved with :meth:`save`."""
        with open(path, "rb") as f:
            blob = pickle.load(f)
        return blob["policy"], blob["params"]
