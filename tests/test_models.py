import jax
import jax.numpy as jnp
import pytest

from rl8_tpu.data import DataKeys
from rl8_tpu.models import (
    DefaultContinuousModel,
    DefaultContinuousRecurrentModel,
    DefaultDiscreteModel,
    DefaultDiscreteRecurrentModel,
    Model,
    RecurrentModel,
)
from rl8_tpu.specs import Discrete, Unbounded
from rl8_tpu.views import ViewRequirement


def test_default_model_cls_dispatch() -> None:
    assert (
        Model.default_model_cls(Unbounded(3), Discrete(2, shape=(1,)))
        is DefaultDiscreteModel
    )
    assert (
        Model.default_model_cls(Unbounded(3), Unbounded(1))
        is DefaultContinuousModel
    )
    with pytest.raises(TypeError):
        Model.default_model_cls(Discrete(2, shape=(1,)), Unbounded(1))
    assert (
        RecurrentModel.default_model_cls(Unbounded(3), Discrete(2, shape=(1,)))
        is DefaultDiscreteRecurrentModel
    )
    assert (
        RecurrentModel.default_model_cls(Unbounded(3), Unbounded(1))
        is DefaultContinuousRecurrentModel
    )


def test_default_discrete_model_forward() -> None:
    model = DefaultDiscreteModel(Unbounded(3), Discrete(4, shape=(2,)), hiddens=(16, 16))
    batch = {DataKeys.OBS: jnp.ones((5, 3))}
    params = model.init(jax.random.key(0), batch)["params"]
    features, values = model.apply({"params": params}, batch)
    assert features["logits"].shape == (5, 2, 4)
    assert values.shape == (5, 1)
    # Small-init head keeps initial logits near zero (near-uniform policy).
    assert float(jnp.max(jnp.abs(features["logits"]))) < 0.1


def test_default_continuous_model_forward() -> None:
    model = DefaultContinuousModel(Unbounded(3), Unbounded(2), hiddens=(16, 16))
    batch = {DataKeys.OBS: jnp.ones((5, 3))}
    params = model.init(jax.random.key(0), batch)["params"]
    features, values = model.apply({"params": params}, batch)
    assert features["mean"].shape == (5, 2)
    assert features["log_std"].shape == (5, 2)
    assert values.shape == (5, 1)
    # log_std is tanh-bounded.
    assert float(jnp.max(jnp.abs(features["log_std"]))) <= 1.0


def test_view_requirements_and_drop_size() -> None:
    model = DefaultDiscreteModel(Unbounded(3), Discrete(2, shape=(1,)), hiddens=(8,))
    assert model.drop_size == 0
    model.validate_view_requirements()
    batch = {DataKeys.OBS: jnp.arange(24, dtype=jnp.float32).reshape(2, 4, 3)}
    views_last = model.apply_view_requirements(batch, kind="last")
    assert views_last[DataKeys.OBS].shape == (2, 3)
    views_all = model.apply_view_requirements(batch, kind="all")
    assert views_all[DataKeys.OBS].shape == (8, 3)


def test_ambiguous_view_requirements_raise() -> None:
    class BadModel(DefaultDiscreteModel):
        @property
        def view_requirements(self):
            return {
                DataKeys.OBS: ViewRequirement(shift=0),
                "other": ViewRequirement(shift=2, method="rolling_window"),
            }

    model = BadModel(Unbounded(3), Discrete(2, shape=(1,)), hiddens=(8,))
    with pytest.raises(RuntimeError):
        model.validate_view_requirements()


def test_empty_view_requirements_raise_clearly() -> None:
    """An override returning no view requirements fails with an
    actionable RuntimeError, not a bare StopIteration, both at
    validation and at drop_size access."""

    class EmptyModel(DefaultDiscreteModel):
        @property
        def view_requirements(self):
            return {}

    model = EmptyModel(Unbounded(3), Discrete(2, shape=(1,)), hiddens=(8,))
    with pytest.raises(RuntimeError, match="empty"):
        model.validate_view_requirements()
    with pytest.raises(RuntimeError, match="empty"):
        _ = model.drop_size


@pytest.mark.parametrize("num_layers", [1, 2])
def test_recurrent_discrete_model_forward(num_layers: int) -> None:
    model = DefaultDiscreteRecurrentModel(
        Unbounded(3), Discrete(2, shape=(1,)), hidden_size=16, num_layers=num_layers
    )
    B, T = 4, 5
    batch = {DataKeys.OBS: jnp.ones((B, T, 3))}
    states = model.init_states(B)
    assert states[DataKeys.HIDDEN_STATES].shape == (B, num_layers, 16)
    params = model.init(jax.random.key(0), batch, states)["params"]
    (features, values), new_states = model.apply({"params": params}, batch, states)
    assert features["logits"].shape == (B * T, 1, 2)
    assert values.shape == (B * T, 1)
    assert new_states[DataKeys.HIDDEN_STATES].shape == (B, num_layers, 16)
    assert new_states[DataKeys.CELL_STATES].shape == (B, num_layers, 16)


def test_recurrent_continuous_model_forward() -> None:
    model = DefaultContinuousRecurrentModel(
        Unbounded(3), Unbounded(2), hidden_size=16
    )
    B, T = 4, 1
    batch = {DataKeys.OBS: jnp.ones((B, T, 3))}
    states = model.init_states(B)
    params = model.init(jax.random.key(0), batch, states)["params"]
    (features, values), new_states = model.apply({"params": params}, batch, states)
    assert features["mean"].shape == (B, 2)
    assert values.shape == (B, 1)


@pytest.mark.slow
def test_recurrent_state_propagation_matters() -> None:
    """Stepping one step at a time with threaded states must equal a single
    multi-step forward."""
    model = DefaultDiscreteRecurrentModel(
        Unbounded(1), Discrete(2, shape=(1,)), hidden_size=8
    )
    B, T = 2, 4
    obs = jax.random.normal(jax.random.key(1), (B, T, 1))
    states = model.init_states(B)
    params = model.init(
        jax.random.key(0), {DataKeys.OBS: obs[:, :1]}, states
    )["params"]
    (full_features, _), _ = model.apply({"params": params}, {DataKeys.OBS: obs}, states)
    step_logits = []
    s = states
    for t in range(T):
        (f, _), s = model.apply({"params": params}, {DataKeys.OBS: obs[:, t : t + 1]}, s)
        step_logits.append(f["logits"])
    stepped = jnp.stack(step_logits, axis=1).reshape(B * T, 1, 2)
    full = full_features["logits"].reshape(B, T, 1, 2).reshape(B * T, 1, 2)
    assert jnp.allclose(stepped, full, atol=1e-5)


def test_positional_embedding_odd_dim() -> None:
    """Odd embedding dims have one fewer cos column (regression: shape
    broadcast crash at table construction)."""
    from rl8_tpu.nn.modules.embeddings import PositionalEmbedding

    mod = PositionalEmbedding(embed_dim=5, max_len=8)
    x = jnp.zeros((2, 4, 5))
    out = mod.apply({}, x)
    assert out.shape == (2, 4, 5)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_recurrent_amp_dtype_threads_through() -> None:
    """enable_amp's bf16 dtype must reach the LSTM cells and heads (it
    was silently a no-op: only the observations were cast)."""
    from rl8_tpu.models import DefaultDiscreteRecurrentModel
    from rl8_tpu.specs import Discrete, Unbounded

    model = DefaultDiscreteRecurrentModel(
        Unbounded(3), Discrete(2, shape=(1,)), hidden_size=8,
        dtype=jnp.bfloat16,
    )
    obs = jnp.zeros((4, 2, 3))
    states = {
        DataKeys.HIDDEN_STATES: jnp.zeros((4, 1, 8)),
        DataKeys.CELL_STATES: jnp.zeros((4, 1, 8)),
    }
    params = model.init(jax.random.key(0), {DataKeys.OBS: obs}, states)["params"]
    # Params stay f32; compute runs bf16 and outputs cast back to f32.
    assert all(
        p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(params)
    )
    lowered = jax.jit(
        lambda p: model.apply({"params": p}, {DataKeys.OBS: obs}, states)
    ).lower(params)
    text = lowered.as_text()
    assert "bf16" in text, "no bf16 compute found in the lowered module"
    (f, v), new_states = model.apply({"params": params}, {DataKeys.OBS: obs}, states)
    assert f["logits"].dtype == jnp.float32
    assert v.dtype == jnp.float32
