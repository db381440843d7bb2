"""NN functional tests, mirroring the analytic GAE golden strategy of
``/root/reference/tests/test_nn/test_functional.py:14-49``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl8_tpu.data import DataKeys
from rl8_tpu.distributions import Categorical
from rl8_tpu.nn.functional import (
    binary_mask_to_float_mask,
    float_mask_to_binary_mask,
    generalized_advantage_estimate,
    mask_from_lengths,
    masked_avg,
    masked_categorical_sample,
    masked_log_softmax,
    masked_max,
    ppo_losses,
    skip_connection,
)


def test_gae_analytic_gamma_lambda_one() -> None:
    """With gamma = lambda = 1, advantages equal undiscounted returns minus
    values, and returns equal cumulative future rewards (plus bootstrap)."""
    T, B = 8, 4
    key = jax.random.key(0)
    rewards = jax.random.normal(key, (T, B, 1))
    values = jnp.zeros((T + 1, B, 1))
    advantages, returns = generalized_advantage_estimate(
        rewards,
        values,
        gae_lambda=1.0,
        gamma=1.0,
        normalize_advantages=False,
        return_returns=True,
    )
    expected = jnp.cumsum(rewards[::-1], axis=0)[::-1]
    np.testing.assert_allclose(np.asarray(advantages), np.asarray(expected), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(returns), np.asarray(expected), rtol=1e-4)


def test_gae_with_values_and_bootstrap() -> None:
    T, B = 4, 2
    rewards = jnp.ones((T, B, 1))
    values = jnp.ones((T + 1, B, 1)) * 0.5
    advantages, returns = generalized_advantage_estimate(
        rewards,
        values,
        gae_lambda=1.0,
        gamma=1.0,
        normalize_advantages=False,
    )
    # adv_t = sum_{s>=t} r_s + V_T - V_t = (T - t) + 0.5 - 0.5
    expected = jnp.arange(T, 0, -1, dtype=jnp.float32).reshape(T, 1, 1)
    expected = jnp.broadcast_to(expected, (T, B, 1))
    np.testing.assert_allclose(np.asarray(advantages), np.asarray(expected), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(returns), np.asarray(expected + 0.5), rtol=1e-4
    )


def test_gae_normalization() -> None:
    T, B = 8, 16
    rewards = jax.random.normal(jax.random.key(1), (T, B, 1))
    values = jax.random.normal(jax.random.key(2), (T + 1, B, 1))
    advantages, _ = generalized_advantage_estimate(
        rewards, values, normalize_advantages=True
    )
    assert abs(float(jnp.mean(advantages))) < 1e-5
    # Normalization divides by the UNBIASED std (torch.std_mean default,
    # ``/root/reference/src/rl8/nn/functional.py:118-122``).
    assert abs(float(jnp.std(advantages, ddof=1)) - 1.0) < 1e-3


def test_gae_reward_scale() -> None:
    T, B = 4, 2
    rewards = jnp.ones((T, B, 1)) * 10.0
    values = jnp.zeros((T + 1, B, 1))
    adv_scaled, _ = generalized_advantage_estimate(
        rewards,
        values,
        gae_lambda=1.0,
        gamma=1.0,
        normalize_advantages=False,
        reward_scale=10.0,
    )
    # adv_t = sum_{s >= t} r_s / (scale + 1e-8) with gamma = lambda = 1.
    expected = np.arange(T, 0, -1, dtype=np.float32).reshape(T, 1, 1) * (
        10.0 / (10.0 + 1e-8)
    )
    expected = np.broadcast_to(expected, (T, B, 1))
    np.testing.assert_allclose(np.asarray(adv_scaled), expected, rtol=1e-4)


def test_mask_converters() -> None:
    binary = jnp.array([[0, 1, 1]])
    fmask = binary_mask_to_float_mask(binary)
    assert float(fmask[0, 0]) == -jnp.inf
    assert float(fmask[0, 1]) == 0.0
    back = float_mask_to_binary_mask(fmask)
    np.testing.assert_array_equal(np.asarray(back), [[False, True, True]])


def test_mask_from_lengths() -> None:
    x = jnp.zeros((2, 4))
    mask = mask_from_lengths(x, jnp.array([2, 4]))
    np.testing.assert_array_equal(
        np.asarray(mask), [[True, True, False, False], [True, True, True, True]]
    )


def test_masked_avg_and_max() -> None:
    x = jnp.array([[[1.0], [2.0], [100.0]]])
    mask = jnp.array([[1, 1, 0]])
    avg = masked_avg(x, mask=mask, dim=1)
    np.testing.assert_allclose(np.asarray(avg), [[1.5]], rtol=1e-6)
    mx, idx = masked_max(x, mask=mask, dim=1)
    np.testing.assert_allclose(np.asarray(mx), [[[2.0]]], rtol=1e-6)
    assert int(idx[0, 0, 0]) == 1


def test_masked_log_softmax_and_sample() -> None:
    x = jnp.array([[0.0, 0.0, 0.0]])
    mask = jnp.array([[1, 1, 0]])
    logits = masked_log_softmax(x, mask=mask, dim=-1)
    np.testing.assert_allclose(
        np.asarray(logits[0, :2]), np.log(0.5) * np.ones(2), rtol=1e-4
    )
    sampled_logits, samples = masked_categorical_sample(
        jnp.tile(x, (128, 1)),
        key=jax.random.key(0),
        mask=jnp.tile(mask, (128, 1)),
        dim=1,
    )
    assert bool(jnp.all(samples < 2))


def test_ppo_losses_zero_update_is_neutral() -> None:
    """When the current distribution matches the sampling distribution,
    the ratio is 1 and the policy loss is the mean advantage."""
    B = 16
    logits = jnp.zeros((B, 1, 2))
    dist = Categorical({"logits": logits})
    actions = jnp.zeros((B, 1), dtype=jnp.int32)
    logp_old = dist.logp(actions)
    advantages = jax.random.normal(jax.random.key(0), (B, 1))
    returns = jnp.ones((B, 1))
    values = jnp.ones((B, 1))
    losses = ppo_losses(
        {
            DataKeys.ACTIONS: actions,
            DataKeys.ADVANTAGES: advantages,
            DataKeys.LOGP: logp_old,
            DataKeys.RETURNS: returns,
        },
        values,
        dist,
        clip_param=0.2,
        dual_clip_param=None,
        entropy_coeff=0.0,
        vf_clip_param=5.0,
        vf_coeff=1.0,
    )
    np.testing.assert_allclose(
        float(losses["policy"]), float(jnp.mean(advantages)), rtol=1e-4
    )
    # Values match returns -> vf loss 0.
    np.testing.assert_allclose(float(losses["vf"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        float(losses["total"]), -float(losses["policy"]), rtol=1e-4
    )
    assert float(losses["entropy"]) == 0.0


def test_ppo_losses_vf_clip() -> None:
    B = 4
    logits = jnp.zeros((B, 1, 2))
    dist = Categorical({"logits": logits})
    actions = jnp.zeros((B, 1), dtype=jnp.int32)
    batch = {
        DataKeys.ACTIONS: actions,
        DataKeys.ADVANTAGES: jnp.zeros((B, 1)),
        DataKeys.LOGP: dist.logp(actions),
        DataKeys.RETURNS: jnp.full((B, 1), 100.0),
    }
    losses = ppo_losses(
        batch, jnp.zeros((B, 1)), dist, vf_clip_param=1.0, dual_clip_param=None
    )
    np.testing.assert_allclose(float(losses["vf"]), 1.0, rtol=1e-6)


def test_ppo_losses_entropy_bonus() -> None:
    B = 4
    logits = jnp.zeros((B, 1, 2))
    dist = Categorical({"logits": logits})
    actions = jnp.zeros((B, 1), dtype=jnp.int32)
    batch = {
        DataKeys.ACTIONS: actions,
        DataKeys.ADVANTAGES: jnp.zeros((B, 1)),
        DataKeys.LOGP: dist.logp(actions),
        DataKeys.RETURNS: jnp.zeros((B, 1)),
    }
    losses = ppo_losses(batch, jnp.zeros((B, 1)), dist, entropy_coeff=0.01)
    np.testing.assert_allclose(float(losses["entropy"]), np.log(2), rtol=1e-4)
    np.testing.assert_allclose(
        float(losses["total"]),
        float(losses["vf"]) - float(losses["policy"]) - 0.01 * np.log(2),
        rtol=1e-4,
    )


def test_ppo_losses_dual_clip() -> None:
    """Dual clip bounds the magnitude of negative-advantage surrogate loss."""
    B = 4
    # Current dist strongly prefers action 1; the sampling dist strongly
    # preferred action 0, so the ratio far exceeds the dual clip bound.
    curr = Categorical({"logits": jnp.tile(jnp.array([[[-10.0, 10.0]]]), (B, 1, 1))})
    old = Categorical({"logits": jnp.tile(jnp.array([[[2.0, -2.0]]]), (B, 1, 1))})
    actions = jnp.ones((B, 1), dtype=jnp.int32)
    batch = {
        DataKeys.ACTIONS: actions,
        DataKeys.ADVANTAGES: jnp.full((B, 1), -1.0),
        DataKeys.LOGP: old.logp(actions),
        DataKeys.RETURNS: jnp.zeros((B, 1)),
    }
    losses = ppo_losses(
        batch, jnp.zeros((B, 1)), curr, clip_param=0.2, dual_clip_param=3.0
    )
    # policy surrogate = max(min(A*r, A*clip(r)), dual * A) = -3
    np.testing.assert_allclose(float(losses["policy"]), -3.0, rtol=1e-4)


def test_skip_connection() -> None:
    x = jnp.ones((2, 3))
    y = jnp.full((2, 3), 2.0)
    np.testing.assert_array_equal(
        np.asarray(skip_connection(x, y, kind="residual")), 3 * np.ones((2, 3))
    )
    assert skip_connection(x, y, kind="cat").shape == (2, 6)
    np.testing.assert_array_equal(
        np.asarray(skip_connection(x, y, kind=None)), np.asarray(y)
    )
    with pytest.raises(ValueError):
        skip_connection(x, y, kind="bogus")


def test_masked_avg_fully_masked_rows_are_zero_not_nan() -> None:
    from rl8_tpu.nn.functional import masked_avg

    x = jnp.ones((2, 3, 4))
    mask = jnp.array([[True, True, False], [False, False, False]])
    out = masked_avg(x, mask=mask, dim=1)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(np.asarray(out[1]), 0.0)
    np.testing.assert_allclose(np.asarray(out[0]), 1.0)
