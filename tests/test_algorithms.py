"""Algorithm tests, mirroring the strategy of
``/root/reference/tests/test_algorithms.py``: gradient-accumulation
equivalence, validate() passing, and env-reset cadence."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl8_tpu import AlgorithmConfig
from rl8_tpu.data import DataKeys
from rl8_tpu.env import ContinuousDummyEnv, DiscreteDummyEnv

NUM_ENVS = 16
HORIZON = 8
HORIZONS_PER_ENV_RESET = 2


@pytest.mark.parametrize("env_cls", [ContinuousDummyEnv, DiscreteDummyEnv])
@pytest.mark.slow
def test_accumulation_equivalence(env_cls) -> None:
    """Same seed: accumulated and non-accumulated steps produce matching
    losses (``/root/reference/tests/test_algorithms.py:16-68``)."""
    SEED = 42
    ENTROPY_COEFF = 1e-2 if env_cls is DiscreteDummyEnv else 0.0
    algo = AlgorithmConfig(
        num_envs=NUM_ENVS,
        horizon=HORIZON,
        entropy_coeff=ENTROPY_COEFF,
        seed=SEED,
        model_config={"hiddens": (16, 16)},
    ).build(env_cls)
    algo.collect()
    non_accumulated = algo.step()

    algo = AlgorithmConfig(
        num_envs=NUM_ENVS,
        horizon=HORIZON,
        accumulate_grads=True,
        entropy_coeff=ENTROPY_COEFF,
        sgd_minibatch_size=NUM_ENVS,
        seed=SEED,
        model_config={"hiddens": (16, 16)},
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


def test_full_epoch_accumulation_is_permutation_invariant() -> None:
    """With ``accumulate_grads`` the optimizer applies once per epoch,
    so the epoch gradient/stats are sums over ALL rows regardless of the
    minibatch partition — which is why the epoch shuffle is skipped
    (`_step_impl`). Permuting whole envs in the buffer (a valid row
    permutation) must leave the step's losses and params unchanged."""
    algo = AlgorithmConfig(
        num_envs=NUM_ENVS,
        horizon=HORIZON,
        accumulate_grads=True,
        sgd_minibatch_size=NUM_ENVS,
        seed=7,
        model_config={"hiddens": (16, 16)},
    ).build(DiscreteDummyEnv)
    algo.collect()
    # step() donates its input state; keep a copy to replay from.
    state = jax.tree_util.tree_map(jnp.copy, algo.state)
    perm = jax.random.permutation(jax.random.key(0), algo.hparams.num_envs)
    permuted_buffer = jax.tree_util.tree_map(
        lambda x: x[:, perm], state.buffer
    )
    stats = algo.step()
    params = algo.state.params

    algo.state = state.replace(buffer=permuted_buffer)
    stats_perm = algo.step()
    params_perm = algo.state.params

    for key in ("losses/policy", "losses/vf", "losses/total"):
        assert math.isclose(
            stats[key], stats_perm[key], rel_tol=1e-4, abs_tol=1e-6
        ), key
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        params,
        params_perm,
    )


@pytest.mark.parametrize("env_cls", [ContinuousDummyEnv, DiscreteDummyEnv])
def test_algorithm_validate(env_cls) -> None:
    algo = AlgorithmConfig(
        horizon=HORIZON, num_envs=NUM_ENVS, model_config={"hiddens": (8,)}
    ).build(env_cls)
    algo.validate()


def test_feedforward_algorithm_resets() -> None:
    """Env-reset cadence honors ``horizons_per_env_reset``
    (``/root/reference/tests/test_algorithms.py:85-101``)."""
    algo = AlgorithmConfig(
        horizon=HORIZON,
        num_envs=NUM_ENVS,
        horizons_per_env_reset=HORIZONS_PER_ENV_RESET,
        model_config={"hiddens": (8,)},
    ).build(DiscreteDummyEnv)
    stats = algo.collect()
    assert int(algo.state.horizons) == 1
    assert stats["env/resets"] == NUM_ENVS
    stats = algo.collect()
    assert int(algo.state.horizons) == 2
    assert stats["env/resets"] == 0
    stats = algo.collect()
    assert int(algo.state.horizons) == 3
    assert stats["env/resets"] == NUM_ENVS


def test_reset_once_when_negative() -> None:
    algo = AlgorithmConfig(
        horizon=HORIZON,
        num_envs=NUM_ENVS,
        horizons_per_env_reset=-1,
        model_config={"hiddens": (8,)},
    ).build(DiscreteDummyEnv)
    assert algo.collect()["env/resets"] == NUM_ENVS
    assert algo.collect()["env/resets"] == 0
    assert algo.collect()["env/resets"] == 0


def test_step_requires_collect() -> None:
    algo = AlgorithmConfig(
        horizon=HORIZON, num_envs=NUM_ENVS, model_config={"hiddens": (8,)}
    ).build(DiscreteDummyEnv)
    with pytest.raises(RuntimeError):
        algo.step()
    algo.collect()
    algo.step()
    with pytest.raises(RuntimeError):
        algo.step()


def test_obs_carries_between_horizons() -> None:
    """Without a reset, the next collect starts from the final obs."""
    algo = AlgorithmConfig(
        horizon=HORIZON,
        num_envs=NUM_ENVS,
        horizons_per_env_reset=2,
        model_config={"hiddens": (8,)},
    ).build(DiscreteDummyEnv)
    algo.collect()
    final_obs = jax.device_get(algo.state.buffer[DataKeys.OBS][-1])
    algo.collect()
    first_obs = jax.device_get(algo.state.buffer[DataKeys.OBS][0])
    assert (final_obs == first_obs).all()


def test_collect_stats_structure() -> None:
    algo = AlgorithmConfig(
        horizon=HORIZON, num_envs=NUM_ENVS, model_config={"hiddens": (8,)}
    ).build(DiscreteDummyEnv)
    stats = algo.collect()
    assert stats["env/steps"] == NUM_ENVS * HORIZON
    for key in ("returns/min", "returns/max", "returns/mean", "returns/std"):
        assert key in stats
    assert stats["returns/min"] <= stats["returns/mean"] <= stats["returns/max"]
    assert stats["profiling/collect_ms"] > 0


def test_step_stats_structure() -> None:
    algo = AlgorithmConfig(
        horizon=HORIZON,
        num_envs=NUM_ENVS,
        entropy_coeff=0.01,
        model_config={"hiddens": (8,)},
    ).build(DiscreteDummyEnv)
    algo.collect()
    stats = algo.step()
    for key in (
        "coefficients/entropy",
        "coefficients/vf",
        "losses/entropy",
        "losses/policy",
        "losses/vf",
        "losses/total",
        "monitors/kl_div",
        "profiling/step_ms",
    ):
        assert key in stats
    assert stats["coefficients/entropy"] == 0.01


def test_target_kl_early_stop_allowed_configs() -> None:
    with pytest.raises(ValueError):
        AlgorithmConfig(
            horizon=HORIZON,
            num_envs=NUM_ENVS,
            target_kl_div=0.1,
            accumulate_grads=True,
            sgd_minibatch_size=NUM_ENVS,
            model_config={"hiddens": (8,)},
        ).build(DiscreteDummyEnv)
    algo = AlgorithmConfig(
        horizon=HORIZON,
        num_envs=NUM_ENVS,
        target_kl_div=1e-8,
        model_config={"hiddens": (8,)},
    ).build(DiscreteDummyEnv)
    algo.collect()
    stats = algo.step()
    assert "monitors/kl_div" in stats


@pytest.mark.slow
def test_learning_on_discrete_dummy_env() -> None:
    """The milestone: PPO learns the optimal dummy-env policy (move
    toward the origin) within a few steps."""
    algo = AlgorithmConfig(
        num_envs=128,
        horizon=16,
        seed=1,
        model_config={"hiddens": (32, 32)},
    ).build(DiscreteDummyEnv)
    for _ in range(25):
        algo.collect(env_config={"bounds": 10.0})
        algo.step()
    batch = {DataKeys.OBS: jnp.array([[[5.0]], [[-5.0]], [[2.0]], [[-2.0]]])}
    out = algo.policy.sample(
        algo.state.params, batch, kind="last", deterministic=True
    )
    assert out[DataKeys.ACTIONS].ravel().tolist() == [0, 1, 0, 1]


@pytest.mark.slow
def test_learning_on_continuous_dummy_env() -> None:
    algo = AlgorithmConfig(
        num_envs=128,
        horizon=16,
        seed=1,
        gae_lambda=0.97,
        gamma=0.99,
        model_config={"hiddens": (32, 32)},
    ).build(ContinuousDummyEnv)
    first = None
    for i in range(25):
        stats = algo.collect(env_config={"bounds": 5.0})
        if first is None:
            first = stats["returns/mean"]
        algo.step()
    assert stats["returns/mean"] > first


@pytest.mark.slow
def test_fused_train_steps_matches_unfused() -> None:
    """train_steps(N) is bit-compatible with N alternating collect/step
    calls (same RNG stream, same scheduler cadence)."""
    kwargs = dict(
        num_envs=NUM_ENVS,
        horizon=HORIZON,
        seed=11,
        entropy_coeff=0.01,
        lr_schedule=[(0, 1e-3), (NUM_ENVS * 2, 1e-4)],
        model_config={"hiddens": (8,)},
    )
    unfused = AlgorithmConfig(**kwargs).build(DiscreteDummyEnv)
    expected = []
    for _ in range(3):
        collect_stats = unfused.collect()
        expected.append({**collect_stats, **unfused.step()})

    fused = AlgorithmConfig(**kwargs).build(DiscreteDummyEnv)
    records = fused.train_steps(3)
    assert len(records) == 3
    for exp, got in zip(expected, records):
        for key in (
            "losses/total",
            "losses/policy",
            "losses/vf",
            "monitors/kl_div",
            "returns/mean",
            "coefficients/entropy",
        ):
            assert abs(exp[key] - got[key]) < 1e-5, (key, exp[key], got[key])
    params_a = jax.device_get(unfused.state.params)
    params_b = jax.device_get(fused.state.params)
    jax.tree_util.tree_map(
        lambda a, b: (abs(a - b).max() < 1e-6) or (_ for _ in ()).throw(AssertionError),
        params_a,
        params_b,
    )


@pytest.mark.slow
def test_fused_train_steps_counts_resets() -> None:
    algo = AlgorithmConfig(
        num_envs=NUM_ENVS,
        horizon=HORIZON,
        horizons_per_env_reset=2,
        model_config={"hiddens": (8,)},
    ).build(DiscreteDummyEnv)
    records = algo.train_steps(4)
    assert [r["env/resets"] for r in records] == [NUM_ENVS, 0, NUM_ENVS, 0]


def _make_action_window_model():
    """Custom discrete model windowing its own past actions — exercises
    rollout-time view requirements on a non-observation buffer key
    (reference semantics: views over the whole buffer batch,
    ``/root/reference/src/rl8/policies/_feedforward.py:135-138``)."""
    import flax.linen as nn

    from rl8_tpu.models import GenericModel, small_uniform_init
    from rl8_tpu.nn import MLP
    from rl8_tpu.views import ViewRequirement

    class ActionWindowModel(GenericModel):
        hiddens: tuple = (16, 16)

        @property
        def view_requirements(self):
            return {
                DataKeys.OBS: ViewRequirement(shift=0),
                DataKeys.ACTIONS: ViewRequirement(shift=2),
            }

        @nn.compact
        def __call__(self, batch):
            obs = batch[DataKeys.OBS]
            actions = batch[DataKeys.ACTIONS][DataKeys.INPUTS]
            mask = batch[DataKeys.ACTIONS][DataKeys.PADDING_MASK]
            n = self.action_spec.n
            one_hot = jax.nn.one_hot(actions[..., 0], n) * (~mask)[..., None]
            x = jnp.concatenate([obs, one_hot.reshape(obs.shape[0], -1)], axis=-1)
            latents = jax.nn.relu(MLP(self.hiddens, name="feature_model")(x))
            logits = nn.Dense(
                n, kernel_init=small_uniform_init(), name="feature_head"
            )(latents).reshape(-1, 1, n)
            vf_latents = jax.nn.relu(MLP(self.hiddens, name="vf_model")(x))
            values = nn.Dense(1, name="vf_head")(vf_latents)
            return {"logits": logits}, values

    return ActionWindowModel


@pytest.mark.slow
def test_action_window_views_train_end_to_end() -> None:
    """A model with ``view_requirements`` on ``DataKeys.ACTIONS`` collects
    and trains; the rollout-time view's final slot is the current (still
    zero) buffer entry, matching the reference's zero-initialized buffer."""
    algo = AlgorithmConfig(
        num_envs=NUM_ENVS,
        horizon=HORIZON,
        model_cls=_make_action_window_model(),
        seed=3,
    ).build(DiscreteDummyEnv)
    for _ in range(2):
        collect_stats = algo.collect()
        step_stats = algo.step()
    assert math.isfinite(step_stats["losses/total"])
    assert math.isfinite(collect_stats["returns/mean"])


def test_non_buffer_view_key_rejected() -> None:
    """View requirements naming a key outside the rollout buffer fail
    loudly at construction."""
    from rl8_tpu.views import ViewRequirement

    cls = _make_action_window_model()

    class BadModel(cls):
        @property
        def view_requirements(self):
            return {DataKeys.OBS: ViewRequirement(shift=0),
                    "not_a_buffer_key": ViewRequirement(shift=1)}

    with pytest.raises(RuntimeError, match="buffer"):
        AlgorithmConfig(
            num_envs=NUM_ENVS, horizon=HORIZON, model_cls=BadModel
        ).build(DiscreteDummyEnv)


def test_carried_window_views_equal_reference_buffer_views() -> None:
    """The collect scan's carried-window view builder
    (`_build_last_views`) must equal the reference's per-step
    `apply_view_requirements(buffer[:, :t+1], kind="last")`
    (`/root/reference/src/rl8/policies/_feedforward.py:135-138`) for
    every t — including shifted views over non-obs buffer keys, whose
    current slot is still zero at sampling time."""
    from rl8_tpu.models import GenericModel, small_uniform_init
    from rl8_tpu.nn import MLP
    from rl8_tpu.views import ViewRequirement

    import flax.linen as nn

    class WindowedModel(GenericModel):
        hiddens: tuple = (8,)

        @property
        def view_requirements(self):
            return {
                DataKeys.OBS: ViewRequirement(shift=2),
                DataKeys.ACTIONS: ViewRequirement(shift=2),
                DataKeys.REWARDS: ViewRequirement(shift=1),
            }

        @nn.compact
        def __call__(self, batch):
            obs = batch[DataKeys.OBS][DataKeys.INPUTS]
            x = obs.reshape(obs.shape[0], -1)
            latents = jax.nn.relu(MLP(self.hiddens, name="feature_model")(x))
            logits = nn.Dense(
                2, kernel_init=small_uniform_init(), name="feature_head"
            )(latents).reshape(-1, 1, 2)
            values = nn.Dense(1, name="vf_head")(
                jax.nn.relu(MLP(self.hiddens, name="vf_model")(x))
            )
            return {"logits": logits}, values

    T = 5
    algo = AlgorithmConfig(
        num_envs=8, horizon=T, model_cls=WindowedModel, seed=0
    ).build(DiscreteDummyEnv)
    model = algo.policy.model
    env = algo._impl_env
    B, S = algo._impl_B, algo._max_shift
    assert S == 2

    key = jax.random.key(7)
    key, reset_key = jax.random.split(key)
    env_state, obs0 = env.reset(reset_key, state=algo.state.env_state, config=None)

    # The scan's carry, maintained with the algorithm's own update rules.
    window = jax.tree_util.tree_map(
        lambda o: jnp.zeros((B, S + 1, *o.shape[1:]), o.dtype).at[:, -1].set(o),
        obs0,
    )
    valid = jnp.zeros((S + 1,), dtype=bool).at[-1].set(True)
    nonobs = algo._init_nonobs_windows()

    # The reference's buffer, maintained the reference's way: the current
    # step's non-obs slots stay zero until after sampling.
    obs_hist = [obs0]
    written_hist: dict = {DataKeys.ACTIONS: [], DataKeys.REWARDS: []}

    def _tree_assert_equal(a, b):
        ja = jax.tree_util.tree_leaves(a)
        jb = jax.tree_util.tree_leaves(b)
        assert len(ja) == len(jb)
        assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
        for x, y in zip(ja, jb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    for t in range(T):
        views = algo._build_last_views(window, valid, nonobs)

        batch = {DataKeys.OBS: jnp.stack(obs_hist, axis=1)}
        for root in (DataKeys.ACTIONS, DataKeys.REWARDS):
            zero_slot = algo._zero_view_slot(root)
            prev = written_hist[root][-t:] if t else []
            batch[root] = jnp.stack([*prev, zero_slot][-(t + 1):], axis=1)
            # Reference buffers are zero-initialized, so slots before the
            # horizon start read as zeros with padding handled by the view
            # method itself — buffer[:, :t+1] has exactly t+1 slots.
            assert batch[root].shape[1] == t + 1
        ref_views = model.apply_view_requirements(batch, kind="last")
        _tree_assert_equal(views, ref_views)

        key, act_key = jax.random.split(key)
        actions = jax.random.randint(
            act_key, algo._zero_view_slot(DataKeys.ACTIONS).shape, 0, 2
        ).astype(algo._zero_view_slot(DataKeys.ACTIONS).dtype)
        env_state, obs_next, rewards = env.step(env_state, actions)
        written = {DataKeys.ACTIONS: actions, DataKeys.REWARDS: rewards}
        nonobs = algo._advance_nonobs_windows(nonobs, written)
        window = jax.tree_util.tree_map(
            lambda w, o: jnp.concatenate([w[:, 1:], o[:, None]], axis=1),
            window,
            obs_next,
        )
        valid = jnp.concatenate([valid[1:], jnp.ones((1,), dtype=bool)])
        obs_hist.append(obs_next)
        for k, v in written.items():
            written_hist[k].append(v)
