"""MLflow pyfunc round trip for the serving models.

The reference's serving contract is proven by
``mlflow.pyfunc.save_model -> load_model -> predict`` equality against a
direct sample (``/root/reference/tests/test_policies.py:104-160``).
MLflow itself is not installable in this environment, so the round trip
runs against the faithful pyfunc harness in
``benchmarks/reference_impl/shims/mlflow`` — the same shim the
reference's OWN test suite passes under (``test_reference_shims.py``),
including mlflow 2.x's signature-aware ``(context, model_input,
params)`` dispatch. If :class:`PolicyModel` or
:class:`RecurrentPolicyModel` drift from the pyfunc protocol
(``load_context``/``predict`` signatures, DataFrame outputs), this
fails.
"""

from __future__ import annotations

import importlib
import os
import sys

import jax
import numpy as np
import pytest

from rl8_tpu.data import DataKeys
from rl8_tpu.policies import Policy, RecurrentPolicy
from rl8_tpu.policies.serving import PolicyModel, RecurrentPolicyModel
from rl8_tpu.specs import Discrete, Unbounded

SHIMS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks",
    "reference_impl",
    "shims",
)

B, T, OBS_DIM = 4, 3, 5


@pytest.fixture()
def mlflow_pyfunc():
    """The mlflow.pyfunc stand-in, imported from the shims package and
    torn back out of ``sys.modules`` afterwards."""
    had = {k: sys.modules.get(k) for k in ("mlflow", "mlflow.pyfunc")}
    sys.path.insert(0, SHIMS)
    try:
        for k in ("mlflow", "mlflow.pyfunc"):
            sys.modules.pop(k, None)
        mlflow = importlib.import_module("mlflow")
        yield mlflow.pyfunc
    finally:
        sys.path.remove(SHIMS)
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_pyfunc_round_trip_feedforward(tmp_path, mlflow_pyfunc) -> None:
    """save_model -> load_model -> predict matches a direct
    deterministic sample (reference ``tests/test_policies.py:104-160``)."""
    policy = Policy(Unbounded(OBS_DIM), Discrete(3, shape=(1,)))
    params = policy.init_params(jax.random.key(0))
    pkl = tmp_path / "policy.pkl"
    policy.save(pkl, params)

    model_dir = str(tmp_path / "pyfunc_model")
    mlflow_pyfunc.save_model(
        model_dir,
        python_model=PolicyModel(),
        artifacts={"policy": str(pkl)},
    )
    loaded = mlflow_pyfunc.load_model(model_dir)

    obs = np.asarray(
        jax.random.normal(jax.random.key(3), (B, T, OBS_DIM)),
        dtype=np.float32,
    )
    df = loaded.predict({DataKeys.OBS: obs})
    assert len(df) == B * T
    assert sorted(df.columns) == [
        DataKeys.ACTIONS,
        DataKeys.LOGP,
        DataKeys.VALUES,
    ]
    direct = policy.sample(
        params,
        {DataKeys.OBS: obs},
        kind="all",
        deterministic=True,
        return_actions=True,
        return_logp=True,
        return_values=True,
    )
    np.testing.assert_array_equal(
        np.stack(df[DataKeys.ACTIONS].to_list()),
        np.asarray(direct[DataKeys.ACTIONS]),
    )
    np.testing.assert_allclose(
        np.stack(df[DataKeys.LOGP].to_list()),
        np.asarray(direct[DataKeys.LOGP]),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.stack(df[DataKeys.VALUES].to_list()),
        np.asarray(direct[DataKeys.VALUES]),
        rtol=1e-5,
        atol=1e-6,
    )


def test_pyfunc_round_trip_recurrent(tmp_path, mlflow_pyfunc) -> None:
    """Recurrent round trip: predict returns ``(outputs_df, states_df)``
    and accepts an optional ``"states"`` input
    (``/root/reference/src/rl8/policies/_recurrent.py:294-324``)."""
    policy = RecurrentPolicy(Unbounded(OBS_DIM), Discrete(3, shape=(1,)))
    params = policy.init_params(jax.random.key(0))
    pkl = tmp_path / "policy.pkl"
    policy.save(pkl, params)

    model_dir = str(tmp_path / "pyfunc_model")
    mlflow_pyfunc.save_model(
        model_dir,
        python_model=RecurrentPolicyModel(),
        artifacts={"policy": str(pkl)},
    )
    loaded = mlflow_pyfunc.load_model(model_dir)

    obs = np.asarray(
        jax.random.normal(jax.random.key(3), (B, T, OBS_DIM)),
        dtype=np.float32,
    )
    outputs, states_df = loaded.predict({DataKeys.OBS: obs})
    assert len(outputs) == B * T
    assert len(states_df) == B

    direct, direct_states = policy.sample(
        params,
        {DataKeys.OBS: obs},
        policy.init_states(B),
        deterministic=True,
        return_actions=True,
        return_logp=True,
        return_values=True,
    )
    np.testing.assert_array_equal(
        np.stack(outputs[DataKeys.ACTIONS].to_list()),
        np.asarray(direct[DataKeys.ACTIONS]),
    )
    np.testing.assert_allclose(
        np.stack(outputs[DataKeys.VALUES].to_list()),
        np.asarray(direct[DataKeys.VALUES]),
        rtol=1e-5,
        atol=1e-6,
    )

    # Feed the returned states back through the pyfunc wrapper: the
    # states round trip must continue the recurrence exactly.
    states_in = {
        k: np.stack(states_df[k].to_list())
        for k in states_df.columns
    }
    outputs2, _ = loaded.predict(
        {DataKeys.OBS: obs, DataKeys.STATES: states_in}
    )
    direct2, _ = policy.sample(
        params,
        {DataKeys.OBS: obs},
        direct_states,
        deterministic=True,
        return_actions=True,
        return_logp=True,
        return_values=True,
    )
    np.testing.assert_array_equal(
        np.stack(outputs2[DataKeys.ACTIONS].to_list()),
        np.asarray(direct2[DataKeys.ACTIONS]),
    )


def test_pyfunc_params_dispatch(tmp_path, mlflow_pyfunc) -> None:
    """The serving models' ``predict`` signatures accept mlflow 2.x's
    three-positional-argument call form — the protocol detail that the
    harness exercises via signature inspection, exactly as mlflow does."""
    import inspect

    for cls in (PolicyModel, RecurrentPolicyModel):
        sig = inspect.signature(cls.predict)
        names = list(sig.parameters)
        assert names[:4] == ["self", "context", "model_input", "params"], (
            f"{cls.__name__}.predict drifted from the pyfunc protocol:"
            f" {names}"
        )
