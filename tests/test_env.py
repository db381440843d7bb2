import jax
import jax.numpy as jnp
import pytest

from rl8_tpu.env import ContinuousDummyEnv, DiscreteDummyEnv


@pytest.mark.parametrize("env_cls", [DiscreteDummyEnv, ContinuousDummyEnv])
def test_reset_and_step_shapes(env_cls) -> None:
    env = env_cls(8, 16)
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (8, 1)
    action = env.action_spec.rand(jax.random.key(1), (8,))
    state, obs, rewards = env.step(state, action)
    assert obs.shape == (8, 1)
    assert rewards.shape == (8, 1)
    assert bool(jnp.all(rewards == -jnp.abs(obs)))


def test_reset_config_persists_in_state() -> None:
    env = DiscreteDummyEnv(64)
    state, obs = env.reset(jax.random.key(0), config={"bounds": 1.0})
    assert bool(jnp.all(jnp.abs(obs) <= 1.0))
    # A reset without a config keeps the previously applied bounds.
    state, obs = env.reset(jax.random.key(1), state=state)
    assert bool(jnp.all(jnp.abs(obs) <= 1.0))
    # Default bounds apply with no config and no prior state.
    _, obs = env.reset(jax.random.key(2))
    assert bool(jnp.any(jnp.abs(obs) > 1.0))


def test_discrete_step_dynamics() -> None:
    env = DiscreteDummyEnv(4)
    state = {"position": jnp.zeros((4, 1)), "bounds": jnp.asarray(1.0)}
    actions = jnp.array([[0], [1], [0], [1]], dtype=jnp.int32)
    state, obs, rewards = env.step(state, actions)
    assert obs.tolist() == [[-1.0], [1.0], [-1.0], [1.0]]


def test_step_is_jittable() -> None:
    env = ContinuousDummyEnv(8)
    state, _ = env.reset(jax.random.key(0))
    step = jax.jit(env.step)
    state, obs, rewards = step(state, jnp.ones((8, 1)))
    assert obs.shape == (8, 1)


def test_max_caps_validated() -> None:
    class Capped(DiscreteDummyEnv):
        max_num_envs = 4
        max_horizon = 8

    with pytest.raises(ValueError):
        Capped(5)
    with pytest.raises(ValueError):
        Capped(4, 9)
    Capped(4, 8)
