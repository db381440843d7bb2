"""Recurrent algorithm tests, mirroring
``/root/reference/tests/test_algorithms.py`` (recurrent halves)."""

import math

import jax
import jax.numpy as jnp
import pytest

from rl8_tpu import RecurrentAlgorithmConfig
from rl8_tpu.data import DataKeys
from rl8_tpu.env import ContinuousDummyEnv, DiscreteDummyEnv

NUM_ENVS = 16
HORIZON = 8
SMALL = {"hidden_size": 8}


@pytest.mark.parametrize("env_cls", [ContinuousDummyEnv, DiscreteDummyEnv])
@pytest.mark.slow
def test_recurrent_accumulation_equivalence(env_cls) -> None:
    SEED = 42
    ENTROPY_COEFF = 1e-2 if env_cls is DiscreteDummyEnv else 0.0
    common = dict(
        num_envs=NUM_ENVS,
        horizon=HORIZON,
        seq_len=2,
        seqs_per_state_reset=4,
        entropy_coeff=ENTROPY_COEFF,
        seed=SEED,
        model_config=SMALL,
    )
    algo = RecurrentAlgorithmConfig(**common).build(env_cls)
    algo.collect()
    non_accumulated = algo.step()

    algo = RecurrentAlgorithmConfig(
        **common, accumulate_grads=True, sgd_minibatch_size=NUM_ENVS
    ).build(env_cls)
    algo.collect()
    accumulated = algo.step()

    for key in (
        "losses/entropy",
        "losses/policy",
        "losses/total",
        "losses/vf",
        "monitors/kl_div",
    ):
        assert math.isclose(
            non_accumulated[key], accumulated[key], rel_tol=1e-3, abs_tol=1e-5
        ), key


@pytest.mark.parametrize("env_cls", [ContinuousDummyEnv, DiscreteDummyEnv])
def test_recurrent_algorithm_validate(env_cls) -> None:
    algo = RecurrentAlgorithmConfig(
        horizon=HORIZON,
        num_envs=NUM_ENVS,
        seq_len=2,
        seqs_per_state_reset=4,
        model_config=SMALL,
    ).build(env_cls)
    algo.validate()


def test_recurrent_algorithm_seq_counters() -> None:
    """Sequence counter semantics mirror
    ``/root/reference/tests/test_algorithms.py:103-125``."""
    algo = RecurrentAlgorithmConfig(
        horizon=HORIZON,
        num_envs=NUM_ENVS,
        seq_len=2,
        seqs_per_state_reset=4,
        model_config=SMALL,
    ).build(DiscreteDummyEnv)
    algo.collect()
    assert int(algo.state.horizons) == 1
    assert int(algo.state.seqs) == HORIZON // 2
    algo.collect()
    assert int(algo.state.horizons) == 2
    assert int(algo.state.seqs) == HORIZON


@pytest.mark.slow
def test_recurrent_states_reset_on_cadence() -> None:
    """With seqs_per_state_reset=1, stored states re-init at every
    sequence boundary; with a longer cadence they persist."""
    algo = RecurrentAlgorithmConfig(
        horizon=4,
        num_envs=4,
        seq_len=2,
        seqs_per_state_reset=1,
        model_config=SMALL,
    ).build(DiscreteDummyEnv)
    algo.collect()
    states = algo.state.buffer[DataKeys.STATES][DataKeys.HIDDEN_STATES]
    # Input states at t=0 and t=2 (sequence starts) are zeros (re-init);
    # t=1 and t=3 are mid-sequence (nonzero after an LSTM step).
    assert float(jnp.abs(states[0]).max()) == 0.0
    assert float(jnp.abs(states[2]).max()) == 0.0
    assert float(jnp.abs(states[1]).max()) > 0.0
    assert float(jnp.abs(states[3]).max()) > 0.0


@pytest.mark.slow
def test_recurrent_states_never_reset_when_negative() -> None:
    algo = RecurrentAlgorithmConfig(
        horizon=4,
        num_envs=4,
        seq_len=2,
        seqs_per_state_reset=-1,
        horizons_per_env_reset=-1,
        model_config=SMALL,
    ).build(DiscreteDummyEnv)
    algo.collect()
    algo.collect()
    states = algo.state.buffer[DataKeys.STATES][DataKeys.HIDDEN_STATES]
    # All post-t=0 stored states are nonzero (no re-inits mid-horizon).
    assert float(jnp.abs(states[1:]).max()) > 0.0
    assert float(jnp.abs(states[1]).max()) > 0.0


def test_recurrent_step_requires_collect() -> None:
    algo = RecurrentAlgorithmConfig(
        horizon=HORIZON,
        num_envs=NUM_ENVS,
        seq_len=2,
        seqs_per_state_reset=4,
        model_config=SMALL,
    ).build(DiscreteDummyEnv)
    with pytest.raises(RuntimeError):
        algo.step()


@pytest.mark.slow
def test_recurrent_learning_on_discrete_dummy_env() -> None:
    algo = RecurrentAlgorithmConfig(
        num_envs=64,
        horizon=16,
        seq_len=4,
        seqs_per_state_reset=4,
        seed=1,
        model_config={"hidden_size": 16},
    ).build(DiscreteDummyEnv)
    first = None
    for _ in range(15):
        stats = algo.collect(env_config={"bounds": 10.0})
        if first is None:
            first = stats["returns/mean"]
        algo.step()
    assert stats["returns/mean"] > first
