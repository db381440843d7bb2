"""Inference/serving shims for exported policies.

Counterpart of the reference's MLflow pyfunc models
(``/root/reference/src/rl8/policies/_feedforward.py:193-310`` and
``_recurrent.py:189-324``): load a pickled policy and serve batched
predictions from NumPy inputs as DataFrames. The same classes plug into
``mlflow.pyfunc`` when MLflow is installed (they implement
``load_context``/``predict`` duck-typed), but they work standalone.
"""

from __future__ import annotations

from os import PathLike
from typing import Any

import numpy as np

from ..data import DataKeys
from ._feedforward import Policy
from ._recurrent import RecurrentPolicy

__all__ = [
    "PolicyModel",
    "RecurrentPolicyModel",
    "MLflowPolicyModel",
    "MLflowRecurrentPolicyModel",
    "get_batch_size_from_model_input",
]


def get_batch_size_from_model_input(x: Any, /) -> tuple[int, int]:
    """Recursively sniff the ``[B, T]`` batch size from a (possibly
    nested) mapping of NumPy arrays
    (``/root/reference/src/rl8/_utils.py:62-99``)."""
    if isinstance(x, dict):
        for v in x.values():
            return get_batch_size_from_model_input(v)
        raise TypeError("Empty mapping has no batch size.")
    arr = np.asarray(x)
    if arr.ndim < 3:
        raise ValueError("Serving inputs must be batched `[B, T, ...]` arrays (ndim >= 3).")
    return int(arr.shape[0]), int(arr.shape[1])


def _resolve_model_input(context: Any, model_input: Any, cls_name: str) -> tuple[Any, Any]:
    """Disambiguate the two supported ``predict`` calling conventions —
    MLflow pyfunc's positional ``(context, model_input, params)`` and the
    standalone single-argument ``predict(model_input)`` — and validate the
    result so a caller using the pre-0.3.0 ``(model_input, context)``
    order gets a clear error instead of an obscure ``KeyError``."""
    if model_input is None:
        context, model_input = None, context
    if not isinstance(model_input, dict) or DataKeys.OBS not in model_input:
        raise TypeError(
            f"{cls_name}.predict expects a mapping with an"
            f" {DataKeys.OBS!r} key as the model input, passed either as"
            " the single argument (`predict(model_input)`) or in MLflow"
            " pyfunc's positional order"
            " (`predict(context, model_input, params)`); got"
            f" {type(model_input).__name__} instead."
        )
    return context, model_input


def _to_dataframe(batch: dict[str, Any], n_rows: int) -> Any:
    """Convert a flat mapping of ``[N, ...]`` arrays to a DataFrame
    (``/root/reference/src/rl8/_utils.py:147-172``)."""
    import pandas as pd

    df = pd.DataFrame(index=range(n_rows))
    for k, v in batch.items():
        df[k] = np.asarray(v).tolist()
    return df


class PolicyModel:
    """Serving wrapper for a feedforward policy
    (``policies/_feedforward.py:193-310``).

    Examples:
        >>> from rl8_tpu.policies.serving import PolicyModel
        >>> model = PolicyModel.load("policy.pkl")  # doctest: +SKIP
        >>> model.predict({"obs": obs_ndarray})  # doctest: +SKIP

    """

    policy: Policy
    params: Any

    def __init__(self, policy: Policy | None = None, params: Any = None) -> None:
        if policy is not None:
            self.policy = policy
            self.params = params

    @classmethod
    def load(cls, path: str | PathLike[str], /) -> "PolicyModel":
        """Load a policy exported with :meth:`Policy.save`."""
        model = cls()
        model.policy, model.params = Policy.load(path)
        return model

    def load_context(self, context: Any) -> None:
        """MLflow pyfunc hook: load from the ``"policy"`` artifact."""
        self.policy, self.params = Policy.load(context.artifacts["policy"])

    def predict(
        self,
        context: Any = None,
        model_input: None | dict[str, Any] = None,
        params: None | dict[str, Any] = None,
    ) -> Any:
        """Deterministically sample the policy for a ``[B, T, ...]`` obs
        batch, returning a ``B * T``-row DataFrame of actions, log
        probabilities, and value estimates.

        Callable both ways: MLflow's pyfunc wrapper passes
        ``(context, model_input, params)`` positionally (the reference
        signature, ``policies/_feedforward.py:255``); standalone callers
        may pass just the model input as the single argument.
        """
        context, model_input = _resolve_model_input(
            context, model_input, type(self).__name__
        )
        obs = model_input[DataKeys.OBS]
        B, T = get_batch_size_from_model_input(obs)
        batch = {DataKeys.OBS: self.policy.observation_spec.encode(obs)}
        out = self.policy.sample(
            self.params,
            batch,
            kind="all",
            deterministic=True,
            return_actions=True,
            return_logp=True,
            return_values=True,
        )
        selected = {
            DataKeys.ACTIONS: out[DataKeys.ACTIONS],
            DataKeys.LOGP: out[DataKeys.LOGP],
            DataKeys.VALUES: out[DataKeys.VALUES],
        }
        # Sample-dropping view requirements shrink the output batch.
        rows = B * (T - self.policy.model.drop_size)
        return _to_dataframe(selected, rows)


class RecurrentPolicyModel:
    """Serving wrapper for a recurrent policy
    (``policies/_recurrent.py:189-324``). ``predict`` also accepts and
    returns recurrent states."""

    policy: RecurrentPolicy
    params: Any

    def __init__(
        self, policy: RecurrentPolicy | None = None, params: Any = None
    ) -> None:
        if policy is not None:
            self.policy = policy
            self.params = params

    @classmethod
    def load(cls, path: str | PathLike[str], /) -> "RecurrentPolicyModel":
        model = cls()
        model.policy, model.params = RecurrentPolicy.load(path)
        return model

    def load_context(self, context: Any) -> None:
        self.policy, self.params = RecurrentPolicy.load(context.artifacts["policy"])

    def predict(
        self,
        context: Any = None,
        model_input: None | dict[str, Any] = None,
        params: None | dict[str, Any] = None,
    ) -> tuple[Any, Any]:
        """Deterministically sample for a ``[B, T, ...]`` obs batch (and
        optional ``"states"``), returning ``(outputs_df, states_df)``.

        Accepts MLflow's positional ``(context, model_input, params)``
        order or a standalone single-argument model input.
        """
        context, model_input = _resolve_model_input(
            context, model_input, type(self).__name__
        )
        obs = model_input[DataKeys.OBS]
        B, T = get_batch_size_from_model_input(obs)
        batch = {DataKeys.OBS: self.policy.observation_spec.encode(obs)}
        if DataKeys.STATES in model_input:
            states = self.policy.state_spec.encode(model_input[DataKeys.STATES])
        else:
            states = self.policy.init_states(B)
        out, new_states = self.policy.sample(
            self.params,
            batch,
            states,
            deterministic=True,
            return_actions=True,
            return_logp=True,
            return_values=True,
        )
        selected = {
            DataKeys.ACTIONS: out[DataKeys.ACTIONS],
            DataKeys.LOGP: out[DataKeys.LOGP],
            DataKeys.VALUES: out[DataKeys.VALUES],
        }
        return _to_dataframe(selected, B * T), _to_dataframe(new_states, B)


#: Aliases under the reference's class names
#: (``/root/reference/src/rl8/policies/_feedforward.py:193``,
#: ``_recurrent.py:189``) so users migrating from rl8 find the serving
#: shims where they expect them.
MLflowPolicyModel = PolicyModel
MLflowRecurrentPolicyModel = RecurrentPolicyModel
