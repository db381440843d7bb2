"""Inference/serving shims for exported policies.

Counterpart of the reference's MLflow pyfunc models
(``/root/reference/src/rl8/policies/_feedforward.py:193-310`` and
``_recurrent.py:189-324``): load a pickled policy and serve batched
predictions from NumPy inputs as DataFrames. The same classes plug into
``mlflow.pyfunc`` when MLflow is installed (they implement
``load_context``/``predict`` duck-typed), but they work standalone.

TPU-native serving: where the reference's predict runs eager PyTorch
(any batch shape, per-op dispatch), these wrappers jit the
deterministic sample once and **bucket request batch sizes to the next
power of two** (edge-padded rows, sliced off after) so a serving
process compiles O(log max-batch) programs instead of one per distinct
request size — compiles on TPU cost tens of seconds, while padding at
most doubles a request's (tiny) compute. Distinct sequence lengths
``T`` still compile separately: view requirements are static gathers
over the time axis by design.
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


def _bucket(n: int, /) -> int:
    """Next power of two >= ``n`` (min 8): bounds the number of distinct
    jit-compiled serving programs to O(log max-batch)."""
    b = 8
    while b < n:
        b *= 2
    return b


def _pad_rows(tree: Any, target: int, /) -> Any:
    """Edge-pad every leaf's leading (batch) dim to ``target`` rows.

    Edge replication (not zeros) keeps padding rows *valid* inputs —
    e.g. an all-zero action mask would make every action -inf for the
    padded rows — so no NaNs can leak out of rows that are sliced off
    anyway.
    """

    def pad(x: Any) -> Any:
        arr = np.asarray(x)
        if arr.shape[0] == target:
            return arr
        widths = [(0, target - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, widths, mode="edge")

    import jax

    return jax.tree_util.tree_map(pad, tree)


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
        >>> import jax
        >>> import numpy as np
        >>> from rl8_tpu.policies import Policy
        >>> from rl8_tpu.policies.serving import PolicyModel
        >>> from rl8_tpu.specs import Discrete, Unbounded
        >>> policy = Policy(Unbounded(3), Discrete(2, shape=(1,)),
        ...                 model_config={"hiddens": (8,)})
        >>> model = PolicyModel(policy, policy.init_params(jax.random.key(0)))
        >>> df = model.predict({"obs": np.zeros((2, 1, 3), np.float32)})
        >>> len(df)  # one row per (batch, time) element
        2
        >>> sorted(df.columns)
        ['actions', 'logp', 'values']

        Production paths load an exported policy instead:
        ``PolicyModel.load("policy.pkl")``.

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

        The sample runs as one jitted program; request batch sizes are
        bucketed to the next power of two (edge-padded, sliced off) so
        a serving process compiles O(log max-batch) programs total.
        """
        context, model_input = _resolve_model_input(
            context, model_input, type(self).__name__
        )
        obs = model_input[DataKeys.OBS]
        B, T = get_batch_size_from_model_input(obs)
        obs = _pad_rows(obs, _bucket(B))
        batch = {DataKeys.OBS: self.policy.observation_spec.encode(obs)}
        selected = self._sample_fn(self.params, batch)
        # ONE batched device->host fetch for all outputs: device_get
        # issues every leaf's transfer asynchronously and blocks once,
        # so a predict pays a single host<->device round trip instead of
        # one per output column (which triples latency on remote links).
        import jax

        selected = jax.device_get(selected)
        # Sample-dropping view requirements shrink the output batch;
        # kind="all" flattens batch-major, so the true batch's rows are
        # the first B * T' rows and the padding slices off the tail.
        rows_per_b = T - self.policy.model.drop_size
        selected = {k: v[: B * rows_per_b] for k, v in selected.items()}
        return _to_dataframe(selected, B * rows_per_b)

    @property
    def _sample_fn(self) -> Any:
        """The jitted deterministic sample (built lazily; jax caches one
        compiled program per padded input shape)."""
        fn = self.__dict__.get("_jit_sample")
        if fn is None:
            import jax

            def _sample(params: Any, batch: Any) -> dict[str, Any]:
                out = self.policy.sample(
                    params,
                    batch,
                    kind="all",
                    deterministic=True,
                    return_actions=True,
                    return_logp=True,
                    return_values=True,
                )
                return {
                    DataKeys.ACTIONS: out[DataKeys.ACTIONS],
                    DataKeys.LOGP: out[DataKeys.LOGP],
                    DataKeys.VALUES: out[DataKeys.VALUES],
                }

            fn = self.__dict__["_jit_sample"] = jax.jit(_sample)
        return fn

    def __getstate__(self) -> dict[str, Any]:
        # Jitted callables don't pickle; rebuilt lazily after load.
        return {
            k: v for k, v in self.__dict__.items() if k != "_jit_sample"
        }


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

        The sample runs as one jitted program; request batch sizes are
        bucketed to the next power of two (edge-padded obs AND states,
        sliced off) so a serving process compiles O(log max-batch)
        programs total.
        """
        context, model_input = _resolve_model_input(
            context, model_input, type(self).__name__
        )
        obs = model_input[DataKeys.OBS]
        B, T = get_batch_size_from_model_input(obs)
        B_pad = _bucket(B)
        obs = _pad_rows(obs, B_pad)
        batch = {DataKeys.OBS: self.policy.observation_spec.encode(obs)}
        if DataKeys.STATES in model_input:
            states = self.policy.state_spec.encode(
                _pad_rows(model_input[DataKeys.STATES], B_pad)
            )
        else:
            states = self.policy.init_states(B_pad)
        import jax

        # ONE batched device->host fetch for outputs AND states (see
        # PolicyModel.predict): transfers overlap, one blocking round trip.
        selected, new_states = jax.device_get(
            self._sample_fn(self.params, batch, states)
        )
        # Batch-major flattening: the true batch's rows come first.
        selected = {k: v[: B * T] for k, v in selected.items()}
        new_states = jax.tree_util.tree_map(lambda v: v[:B], new_states)
        return _to_dataframe(selected, B * T), _to_dataframe(new_states, B)

    @property
    def _sample_fn(self) -> Any:
        """The jitted deterministic sample (built lazily; jax caches one
        compiled program per padded input shape)."""
        fn = self.__dict__.get("_jit_sample")
        if fn is None:
            import jax

            def _sample(
                params: Any, batch: Any, states: Any
            ) -> tuple[dict[str, Any], Any]:
                out, new_states = self.policy.sample(
                    params,
                    batch,
                    states,
                    deterministic=True,
                    return_actions=True,
                    return_logp=True,
                    return_values=True,
                )
                return {
                    DataKeys.ACTIONS: out[DataKeys.ACTIONS],
                    DataKeys.LOGP: out[DataKeys.LOGP],
                    DataKeys.VALUES: out[DataKeys.VALUES],
                }, new_states

            fn = self.__dict__["_jit_sample"] = jax.jit(_sample)
        return fn

    def __getstate__(self) -> dict[str, Any]:
        # Jitted callables don't pickle; rebuilt lazily after load.
        return {
            k: v for k, v in self.__dict__.items() if k != "_jit_sample"
        }


#: Aliases under the reference's class names
#: (``/root/reference/src/rl8/policies/_feedforward.py:193``,
#: ``_recurrent.py:189``) so users migrating from rl8 find the serving
#: shims where they expect them.
MLflowPolicyModel = PolicyModel
MLflowRecurrentPolicyModel = RecurrentPolicyModel
