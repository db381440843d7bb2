"""Feedforward policy.

Counterpart of ``/root/reference/src/rl8/policies/_feedforward.py``.
``sample`` is a pure function usable directly inside jitted programs; the
reference's ``requires_grad``/``inplace``/train-mode toggling
(``policies/_feedforward.py:140-175``) have no JAX analog and are
intentionally absent (wrap calls in ``jax.grad`` for gradients).
"""

from __future__ import annotations

import pickle
from os import PathLike
from typing import Any

import jax

from ..data import DataKeys
from ..distributions import Distribution
from ..models import Model, ModelFactory
from ..specs import Spec
from ..views import ViewKind
from ._base import GenericPolicyBase

__all__ = ["Policy"]


class Policy(GenericPolicyBase[Model]):
    """The union of a feedforward model and an action distribution
    (``/root/reference/src/rl8/policies/_feedforward.py:20-190``).

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
        model: None | Model = None,
        model_cls: None | ModelFactory = None,
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
            model_cls = model_cls or Model.default_model_cls(
                observation_spec, action_spec
            )
            self.model = model_cls(observation_spec, action_spec, **self.model_config)
        else:
            self.model = model
        self.distribution_cls = distribution_cls or Distribution.default_dist_cls(
            action_spec
        )

    def init_params(self, key: jax.Array, /) -> Any:
        """Initialize model parameters with a spec-derived dummy batch."""
        import jax.numpy as jnp

        max_shift = max(
            (vr.shift for vr in self.model.view_requirements.values()), default=0
        )
        T = max_shift + 1
        batch: dict[str, Any] = {
            DataKeys.OBS: self.observation_spec.zero((1, T))
        }
        # Zero stand-ins for any non-obs buffer keys the model windows
        # (views may reference actions/rewards/logp/values like the
        # reference's whole-buffer view application).
        for viewed in self.model.view_requirements:
            if isinstance(viewed, tuple) or viewed == DataKeys.OBS:
                continue
            if viewed == DataKeys.ACTIONS:
                batch[viewed] = self.action_spec.zero((1, T))
            else:
                batch[viewed] = jnp.zeros((1, T, 1))
        views = self.model.apply_view_requirements(batch, kind="last")
        return self.model.init(key, views)["params"]

    def sample(
        self,
        params: Any,
        batch: Any,
        /,
        *,
        kind: ViewKind = "last",
        key: None | jax.Array = None,
        deterministic: bool = False,
        return_actions: bool = True,
        return_logp: bool = False,
        return_values: bool = False,
        return_views: bool = False,
    ) -> dict[str, Any]:
        """Sample the policy: run views + model forward and optionally draw
        actions/log-probs/values (``policies/_feedforward.py:66-176``).

        Args:
            params: Model parameters.
            batch: Pytree with leading ``[B, T, ...]`` dims. If a
                ``"views"`` key is present it is used directly as the
                preprocessed model input.
            kind: ``"last"`` (sample for latest observations) or ``"all"``
                (sample over the whole horizon, folding time into batch).
            key: PRNG key; required when ``return_actions`` and not
                ``deterministic``.
            deterministic: Whether to sample deterministically.
            return_actions / return_logp / return_values / return_views:
                Which optional outputs to include.

        Returns:
            Mapping with at least ``"features"``, batch size ``[B * T, ...]``
            (or ``[B, ...]`` for ``kind="last"``).

        """
        if isinstance(batch, dict) and DataKeys.VIEWS in batch:
            in_batch = batch[DataKeys.VIEWS]
        else:
            in_batch = self.model.apply_view_requirements(batch, kind=kind)
        features, values = self.model.apply({"params": params}, in_batch)
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
        if return_views:
            out[DataKeys.VIEWS] = in_batch
        return out

    def save(self, path: str | PathLike[str], params: Any, /) -> None:
        """Serialize the policy (module config + params) to ``path``
        (counterpart of the cloudpickle export at
        ``policies/_feedforward.py:178-190``)."""
        with open(path, "wb") as f:
            pickle.dump({"policy": self, "params": jax.device_get(params)}, f)

    @staticmethod
    def load(path: str | PathLike[str], /) -> tuple["Policy", Any]:
        """Load a policy and its params saved with :meth:`save`."""
        with open(path, "rb") as f:
            blob = pickle.load(f)
        return blob["policy"], blob["params"]
