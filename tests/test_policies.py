"""Policy sample-shape and export round-trip tests, mirroring
``/root/reference/tests/test_policies.py``."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rl8_tpu.data import DataKeys
from rl8_tpu.policies import Policy, RecurrentPolicy
from rl8_tpu.policies.serving import PolicyModel, RecurrentPolicyModel
from rl8_tpu.specs import Discrete, Unbounded

B, T = 4, 3
OBS_DIM = 2


def _policy() -> tuple[Policy, object]:
    policy = Policy(
        Unbounded(OBS_DIM),
        Discrete(2, shape=(1,)),
        model_config={"hiddens": (8,)},
    )
    params = policy.init_params(jax.random.key(0))
    return policy, params


def _recurrent_policy() -> tuple[RecurrentPolicy, object]:
    policy = RecurrentPolicy(
        Unbounded(OBS_DIM),
        Discrete(2, shape=(1,)),
        model_config={"hidden_size": 8},
    )
    params = policy.init_params(jax.random.key(0))
    return policy, params


def test_sample_shapes_last_vs_all() -> None:
    """kind="last" -> [B, ...]; kind="all" -> [B*T, ...]
    (``tests/test_policies.py:24-101``)."""
    policy, params = _policy()
    batch = {DataKeys.OBS: jax.random.normal(jax.random.key(1), (B, T, OBS_DIM))}
    out = policy.sample(
        params, batch, kind="last", key=jax.random.key(2),
        return_logp=True, return_values=True,
    )
    assert out[DataKeys.ACTIONS].shape == (B, 1)
    assert out[DataKeys.LOGP].shape == (B, 1)
    assert out[DataKeys.VALUES].shape == (B, 1)
    out = policy.sample(
        params, batch, kind="all", key=jax.random.key(2),
        return_logp=True, return_values=True,
    )
    assert out[DataKeys.ACTIONS].shape == (B * T, 1)
    assert out[DataKeys.LOGP].shape == (B * T, 1)
    assert out[DataKeys.VALUES].shape == (B * T, 1)


def test_sample_requires_key_when_stochastic() -> None:
    policy, params = _policy()
    batch = {DataKeys.OBS: jax.random.normal(jax.random.key(1), (B, T, OBS_DIM))}
    with pytest.raises(ValueError):
        policy.sample(params, batch, kind="last")
    # Deterministic needs no key.
    policy.sample(params, batch, kind="last", deterministic=True)


def test_sample_reuses_provided_views() -> None:
    policy, params = _policy()
    batch = {DataKeys.OBS: jax.random.normal(jax.random.key(1), (B, T, OBS_DIM))}
    out = policy.sample(
        params, batch, kind="all", deterministic=True, return_views=True
    )
    rebatch = {DataKeys.VIEWS: out[DataKeys.VIEWS]}
    out2 = policy.sample(params, rebatch, kind="all", deterministic=True)
    np.testing.assert_array_equal(
        np.asarray(out[DataKeys.ACTIONS]), np.asarray(out2[DataKeys.ACTIONS])
    )


def test_policy_export_round_trip(tmp_path) -> None:
    """Save -> load -> predict matches a direct sample
    (``tests/test_policies.py:104-160``)."""
    policy, params = _policy()
    path = tmp_path / "policy.pkl"
    policy.save(path, params)
    model = PolicyModel.load(path)
    obs = np.asarray(
        jax.random.normal(jax.random.key(3), (B, T, OBS_DIM)), dtype=np.float32
    )
    df = model.predict({DataKeys.OBS: obs})
    assert len(df) == B * T
    direct = policy.sample(
        params,
        {DataKeys.OBS: obs},
        kind="all",
        deterministic=True,
        return_logp=True,
        return_values=True,
    )
    np.testing.assert_allclose(
        np.stack(df[DataKeys.VALUES].to_list()),
        np.asarray(direct[DataKeys.VALUES]),
        rtol=1e-5,
    )
    np.testing.assert_array_equal(
        np.stack(df[DataKeys.ACTIONS].to_list()),
        np.asarray(direct[DataKeys.ACTIONS]),
    )


def test_recurrent_policy_export_round_trip(tmp_path) -> None:
    policy, params = _recurrent_policy()
    path = tmp_path / "policy.pkl"
    policy.save(path, params)
    model = RecurrentPolicyModel.load(path)
    obs = np.asarray(
        jax.random.normal(jax.random.key(3), (B, T, OBS_DIM)), dtype=np.float32
    )
    outputs, states = model.predict({DataKeys.OBS: obs})
    assert len(outputs) == B * T
    assert len(states) == B


def test_recurrent_sample_threads_states() -> None:
    policy, params = _recurrent_policy()
    batch = {DataKeys.OBS: jax.random.normal(jax.random.key(1), (B, T, OBS_DIM))}
    states = policy.init_states(B)
    out, new_states = policy.sample(
        params, batch, states, key=jax.random.key(2), return_values=True
    )
    assert out[DataKeys.ACTIONS].shape == (B * T, 1)
    assert out[DataKeys.VALUES].shape == (B * T, 1)
    leaf = new_states[DataKeys.HIDDEN_STATES]
    assert leaf.shape[0] == B


class _CompositeModel:
    """Defined lazily at module level so the pickled policy export can
    reference it (pickle rejects function-local classes)."""


def _make_composite_model_cls():
    import flax.linen as nn

    from rl8_tpu.models import Model

    global _CompositeModel

    class _CompositeModel(Model):  # noqa: F811 - module-level for pickling
        @nn.compact
        def __call__(self, batch):
            obs = batch[DataKeys.OBS]
            x = jnp.concatenate([obs["a"], obs["b"]], axis=-1)
            latents = nn.relu(nn.Dense(16)(x))
            logits = nn.Dense(3)(latents).reshape(-1, 1, 3)
            values = nn.Dense(1)(latents)
            return {"logits": logits}, values

    _CompositeModel.__qualname__ = "_CompositeModel"
    return _CompositeModel


def test_serving_composite_observations(tmp_path) -> None:
    """PolicyModel.predict round-trips composite (nested-dict) NumPy
    observations through spec encoding, mirroring the reference's
    pyfunc shim on the algotrading-style envs."""
    import numpy as np

    from rl8_tpu.policies import Policy
    from rl8_tpu.policies.serving import PolicyModel
    from rl8_tpu.specs import Composite, Discrete, Unbounded

    CompositeModel = _make_composite_model_cls()
    obs_spec = Composite({"a": Unbounded(2), "b": Unbounded(3)})
    action_spec = Discrete(3, shape=(1,))
    policy = Policy(obs_spec, action_spec, model_cls=CompositeModel)
    params = policy.init_params(jax.random.key(0))
    path = tmp_path / "policy.pkl"
    policy.save(path, params)

    model = PolicyModel.load(path)
    B, T = 4, 2
    df = model.predict(
        {
            DataKeys.OBS: {
                "a": np.random.randn(B, T, 2).astype(np.float32),
                "b": np.random.randn(B, T, 3).astype(np.float32),
            }
        }
    )
    assert len(df) == B * T
    assert set(df.columns) >= {DataKeys.ACTIONS, DataKeys.LOGP, DataKeys.VALUES}


def test_serving_predict_accepts_mlflow_positional_order(tmp_path) -> None:
    """MLflow's pyfunc wrapper calls predict(context, model_input,
    params) positionally; both that order and the standalone
    single-argument form must work."""
    import numpy as np

    from rl8_tpu.policies import Policy
    from rl8_tpu.policies.serving import PolicyModel
    from rl8_tpu.specs import Discrete, Unbounded

    policy = Policy(Unbounded(1), Discrete(2, shape=(1,)))
    params = policy.init_params(jax.random.key(0))
    path = tmp_path / "policy.pkl"
    policy.save(path, params)

    model = PolicyModel()

    class _Ctx:
        artifacts = {"policy": str(path)}

    model.load_context(_Ctx())
    obs = np.zeros((2, 3, 1), dtype=np.float32)
    df_standalone = model.predict({DataKeys.OBS: obs})
    df_positional = model.predict(None, {DataKeys.OBS: obs})
    assert len(df_standalone) == len(df_positional) == 6
    assert (
        df_standalone[DataKeys.ACTIONS].tolist()
        == df_positional[DataKeys.ACTIONS].tolist()
    )
    # A pre-0.3.0 caller passing (model_input, some_context) positionally
    # gets a clear TypeError naming the accepted conventions, not an
    # obscure KeyError from binding the context as the model input.
    with pytest.raises(TypeError, match="calling convention|positional order|mapping"):
        model.predict({DataKeys.OBS: obs}, object())


def test_serving_buckets_batch_sizes_and_reuses_compiles() -> None:
    """Serving jits the deterministic sample and buckets request batch
    sizes to the next power of two: odd sizes match the direct sample
    exactly after the padding slices off, and sizes within one bucket
    share a single compiled program."""
    policy, params = _policy()
    model = PolicyModel(policy, params)

    def run(b: int) -> None:
        obs = np.asarray(
            jax.random.normal(jax.random.key(b), (b, T, OBS_DIM)),
            dtype=np.float32,
        )
        df = model.predict({DataKeys.OBS: obs})
        assert len(df) == b * T
        direct = policy.sample(
            params,
            {DataKeys.OBS: jnp.asarray(obs)},
            kind="all",
            deterministic=True,
            return_logp=True,
            return_values=True,
        )
        np.testing.assert_allclose(
            np.stack(df[DataKeys.VALUES].to_list()).ravel(),
            np.asarray(direct[DataKeys.VALUES]).ravel(),
            rtol=1e-5,
        )
        np.testing.assert_array_equal(
            np.stack(df[DataKeys.ACTIONS].to_list()),
            np.asarray(direct[DataKeys.ACTIONS]),
        )

    run(3)
    run(5)  # same bucket (8): no new compile
    assert model._sample_fn._cache_size() == 1
    run(9)  # next bucket (16): exactly one more compile
    assert model._sample_fn._cache_size() == 2


def test_recurrent_serving_buckets_and_round_trips_states() -> None:
    """Recurrent serving pads obs AND states to the bucket, slices both
    back, and returned states feed the next request."""
    policy, params = _recurrent_policy()
    model = RecurrentPolicyModel(policy, params)
    b = 3  # pads to 8
    obs = np.asarray(
        jax.random.normal(jax.random.key(1), (b, T, OBS_DIM)), dtype=np.float32
    )
    outputs, states_df = model.predict({DataKeys.OBS: obs})
    assert len(outputs) == b * T
    assert len(states_df) == b

    direct, direct_states = policy.sample(
        params,
        {DataKeys.OBS: jnp.asarray(obs)},
        policy.init_states(b),
        deterministic=True,
        return_values=True,
    )
    np.testing.assert_array_equal(
        np.stack(outputs[DataKeys.ACTIONS].to_list()),
        np.asarray(direct[DataKeys.ACTIONS]),
    )
    np.testing.assert_allclose(
        np.stack(states_df[DataKeys.HIDDEN_STATES].to_list()),
        np.asarray(direct_states[DataKeys.HIDDEN_STATES]),
        rtol=1e-5,
    )

    # Feed the returned states back (second segment of the stream).
    states = {
        k: np.stack(states_df[k].to_list())
        for k in (DataKeys.HIDDEN_STATES, DataKeys.CELL_STATES)
    }
    outputs2, states_df2 = model.predict(
        {DataKeys.OBS: obs, DataKeys.STATES: states}
    )
    assert len(outputs2) == b * T
    assert len(states_df2) == b
    assert model._sample_fn._cache_size() == 1  # same bucket throughout


def test_serving_predict_fetches_device_outputs_once(monkeypatch) -> None:
    """predict performs exactly ONE batched device->host fetch
    (jax.device_get of the whole output tree). Per-column fetches pay
    one link round trip per output — the regression that made jitted
    serving slower than eager at B=1 on remote links (docs/performance.md
    section "Serving latency")."""
    import rl8_tpu.policies.serving as serving

    policy, params = _policy()
    model = PolicyModel(policy, params)
    obs = np.asarray(
        jax.random.normal(jax.random.key(3), (2, 1, OBS_DIM)), dtype=np.float32
    )
    calls = []
    real = jax.device_get

    def counting(x):
        calls.append(type(x).__name__)
        return real(x)

    monkeypatch.setattr(jax, "device_get", counting)
    df = model.predict({DataKeys.OBS: obs})
    assert len(df) == 2
    assert len(calls) == 1, calls


def test_serving_drop_size_view_model() -> None:
    """predict with a sample-dropping (rolling_window) view model
    returns ``B * (T - drop_size)`` rows — the reference's DataFrame row
    contract when a model's views drop early timesteps
    (``/root/reference/src/rl8/policies/_feedforward.py:296-310``)."""
    import flax.linen as nn

    from rl8_tpu.models import DefaultDiscreteModel
    from rl8_tpu.views import ViewRequirement

    class WindowDiscreteModel(DefaultDiscreteModel):
        """Consumes a 3-step observation window (drop method)."""

        @property
        def view_requirements(self):
            return {
                DataKeys.OBS: ViewRequirement(
                    shift=2, method="rolling_window"
                )
            }

        @nn.compact
        def __call__(self, batch):
            w = batch[DataKeys.OBS]  # [N, shift + 1, obs_dim]
            return super().__call__(
                {DataKeys.OBS: w.reshape(w.shape[0], -1)}
            )

    policy = Policy(
        Unbounded(OBS_DIM),
        Discrete(2, shape=(1,)),
        model_cls=WindowDiscreteModel,
        model_config={"hiddens": (8,)},
    )
    assert policy.model.drop_size == 2
    T_long = 5
    obs = np.asarray(
        jax.random.normal(jax.random.key(5), (B, T_long, OBS_DIM)),
        dtype=np.float32,
    )
    params = policy.init_params(jax.random.key(0))
    # Constructed directly: pickling a test-local model class is not
    # the contract under test (export round trips are covered above).
    model = PolicyModel(policy, params)
    df = model.predict({DataKeys.OBS: obs})
    assert len(df) == B * (T_long - 2)
    direct = policy.sample(
        params,
        {DataKeys.OBS: obs},
        kind="all",
        deterministic=True,
        return_actions=True,
    )
    np.testing.assert_array_equal(
        np.stack(df[DataKeys.ACTIONS].to_list()),
        np.asarray(direct[DataKeys.ACTIONS]),
    )
