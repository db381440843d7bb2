"""End-to-end checks for the bundled examples (small configs), mirroring
the reference's example coverage (SURVEY.md section 2.2)."""

import jax
import pytest

from rl8_tpu import AlgorithmConfig, RecurrentAlgorithmConfig

from examples.algotrading.env import AlgoTrading
from examples.algotrading.models import AttentiveAlpaca, LazyLemur, MischievousMule
from examples.cartpole.env import CartPole
from examples.mountain_car.env import MountainCar
from examples.pendulum.env import Pendulum

pytestmark = pytest.mark.slow  # end-to-end drives; excluded from `-m 'not slow'`

SMALL = dict(num_envs=8, horizon=8)


@pytest.mark.parametrize("env_cls", [CartPole, Pendulum, MountainCar])
def test_classic_control_envs_train_one_step(env_cls) -> None:
    algo = AlgorithmConfig(
        **SMALL, model_config={"hiddens": (16,)}
    ).build(env_cls)
    algo.collect()
    stats = algo.step()
    assert "losses/total" in stats


def test_cartpole_env_dynamics() -> None:
    env = CartPole(4, 16)
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (4, 5)
    state, obs, rewards = env.step(state, env.action_spec.zero((4,)))
    assert obs.shape == (4, 5)
    assert rewards.shape == (4, 1)
    # Shaped rewards are negative away from the upright balance point.
    assert float(rewards.max()) <= 0.0


def test_cartpole_domain_randomization() -> None:
    env = CartPole(4, 16)
    state, _ = env.reset(jax.random.key(0), config={"gravity": 1.0})
    assert float(state["cfg"]["gravity"]) == 1.0
    # Like the reference, CartPole's config rebuilds from defaults on a
    # config-less reset (``/root/reference/examples/cartpole/env.py:127``).
    state, _ = env.reset(jax.random.key(1), state=state)
    assert abs(float(state["cfg"]["gravity"]) - 9.8) < 1e-5


def test_pendulum_rewards_nonpositive() -> None:
    env = Pendulum(4, 16)
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (4, 3)
    state, obs, rewards = env.step(state, env.action_spec.zero((4,)))
    assert float(rewards.max()) <= 0.0


def test_algotrading_env_contract() -> None:
    env = AlgoTrading(8, 16)
    state, obs = env.reset(jax.random.key(0))
    env.observation_spec.assert_is_in(obs)
    assert obs["action_mask"].shape == (8, 3)
    # Not invested at reset: HOLD/BUY valid, SELL invalid.
    assert bool(obs["action_mask"][:, 0].all())
    assert bool(obs["action_mask"][:, 1].all())
    assert not bool(obs["action_mask"][:, 2].any())
    # Buy everywhere -> now invested; SELL valid, BUY invalid.
    import jax.numpy as jnp

    buy = jnp.ones((8, 1), dtype=jnp.int32)
    state, obs, rewards = env.step(state, buy)
    assert bool(obs["invested"].all())
    assert not bool(obs["action_mask"][:, 1].any())
    assert bool(obs["action_mask"][:, 2].all())


@pytest.mark.parametrize(
    "model_cls,model_config",
    [
        (MischievousMule, {"hiddens": (16,), "seq_len": 4}),
        (AttentiveAlpaca, {"hiddens": (16,), "seq_len": 4, "num_layers": 1}),
    ],
)
def test_algotrading_feedforward_models_train(model_cls, model_config) -> None:
    algo = AlgorithmConfig(
        **SMALL, model_cls=model_cls, model_config=model_config
    ).build(AlgoTrading)
    algo.collect()
    stats = algo.step()
    assert "losses/total" in stats


def test_algotrading_recurrent_model_trains() -> None:
    algo = RecurrentAlgorithmConfig(
        **SMALL,
        seq_len=2,
        seqs_per_state_reset=4,
        model_cls=LazyLemur,
        model_config={"hiddens": (16,), "hidden_size": 16},
    ).build(AlgoTrading)
    algo.collect()
    stats = algo.step()
    assert "losses/total" in stats


def test_cartpole_solves() -> None:
    """Learning-curve parity target (BASELINE.md): CartPole's shaped
    returns climb from ~-200 toward ~-10 within ~25 steps."""
    from rl8_tpu import AlgorithmConfig

    algo = AlgorithmConfig(num_envs=256, horizon=64, seed=0).build(CartPole)
    records = algo.train_steps(25)
    assert records[0]["returns/mean"] < -100.0
    assert records[-1]["returns/mean"] > -40.0


def test_cartpole_kinematics_integrator() -> None:
    """Both integrators from the reference config are supported
    (``/root/reference/examples/cartpole/env.py:42-51``) and produce
    different (finite) trajectories."""
    import jax
    import jax.numpy as jnp

    from examples.cartpole.env import CartPole

    env = CartPole(8)
    key = jax.random.key(0)
    action = jnp.ones((8, 1), dtype=jnp.int32) * 2

    state_e, _ = env.reset(key, config={"kinematics_integrator": "euler"})
    state_s, _ = env.reset(key, config={"kinematics_integrator": "semi_implicit"})
    for _ in range(5):
        state_e, obs_e, r_e = env.step(state_e, action)
        state_s, obs_s, r_s = env.step(state_s, action)
    assert jnp.isfinite(obs_e).all() and jnp.isfinite(obs_s).all()
    assert not jnp.allclose(obs_e, obs_s)
    # Derived config fields follow the reference's __post_init__.
    from examples.cartpole.env import CartPoleConfig

    cfg = CartPoleConfig(pole_mass=0.2, length=1.0, cart_mass=2.0)
    assert cfg.pole_mass_length == 0.2
    assert cfg.total_mass == 2.2
    # Derived fields are init=False: passing one raises instead of being
    # silently recomputed.
    with pytest.raises(TypeError):
        CartPoleConfig(total_mass=5.0)


def test_algotrading_sell_resets_position_to_current_price() -> None:
    """After a SELL the position tracks the current price (the reference
    recomputes its invested mask post-transition), so the next
    LOG_CHANGE(price, position) is relative to the sell price, not the
    stale buy-in price."""
    import jax
    import jax.numpy as jnp

    from examples.algotrading.env import Action, AlgoTrading

    env = AlgoTrading(4)
    state, _ = env.reset(jax.random.key(0))
    buy = jnp.full((4, 1), Action.BUY, dtype=jnp.int32)
    sell = jnp.full((4, 1), Action.SELL, dtype=jnp.int32)
    state, _, _ = env.step(state, buy)
    price_before_sell = state["price"]
    state, _, _ = env.step(state, sell)
    assert jnp.allclose(state["position"], price_before_sell)
    assert (state["invested"] == 0).all()
