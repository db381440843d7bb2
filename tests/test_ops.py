"""Pallas kernel equivalence tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from rl8_tpu.nn.functional import generalized_advantage_estimate
from rl8_tpu.ops import pallas_gae


def test_pallas_gae_matches_scan() -> None:
    T, B = 8, 12
    rewards = jax.random.normal(jax.random.key(0), (T, B, 1))
    values = jax.random.normal(jax.random.key(1), (T + 1, B, 1))
    for gamma, lam, scale in ((0.95, 0.95, 1.0), (0.99, 0.9, 3.7), (1.0, 1.0, 1.0)):
        ref_adv, ref_ret = generalized_advantage_estimate(
            rewards,
            values,
            gamma=gamma,
            gae_lambda=lam,
            normalize_advantages=False,
            reward_scale=scale,
        )
        adv, ret = pallas_gae(
            rewards,
            values,
            scale,
            gamma=gamma,
            gae_lambda=lam,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(adv), np.asarray(ref_adv), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ret), np.asarray(ref_ret), rtol=1e-5, atol=1e-5
        )


def test_pallas_gae_large_batch_padding() -> None:
    """Batch sizes above one tile exercise the grid and pad/slice paths."""
    T, B = 4, 600
    rewards = jnp.ones((T, B, 1))
    values = jnp.zeros((T + 1, B, 1))
    adv, ret = pallas_gae(
        rewards, values, 1.0, gamma=1.0, gae_lambda=1.0, interpret=True
    )
    expected = jnp.arange(T, 0, -1, dtype=jnp.float32).reshape(T, 1, 1)
    np.testing.assert_allclose(
        np.asarray(adv),
        np.broadcast_to(np.asarray(expected), (T, B, 1)) / (1 + 1e-8),
        rtol=1e-5,
    )
