"""Flattened-optimizer equivalence tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from rl8_tpu.utils.optim import flatten_optimizer


def _params():
    return {
        "dense": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros((4,))},
        "head": {"kernel": jnp.full((4, 2), 0.5)},
    }


@pytest.mark.slow
def test_flatten_optimizer_matches_pytree_optimizer() -> None:
    params = _params()
    grads = jax.tree_util.tree_map(
        lambda x: jnp.arange(x.size, dtype=jnp.float32).reshape(x.shape) / 10,
        params,
    )
    inner = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-2))
    flat = flatten_optimizer(inner, params)

    s_a, s_b = inner.init(params), flat.init(params)
    p_a, p_b = params, params
    for _ in range(5):
        u_a, s_a = inner.update(grads, s_a, p_a)
        p_a = optax.apply_updates(p_a, u_a)
        u_b, s_b = flat.update(grads, s_b, p_b)
        p_b = optax.apply_updates(p_b, u_b)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6), p_a, p_b
    )


def test_flatten_optimizer_state_is_flat() -> None:
    params = _params()
    flat = flatten_optimizer(optax.adam(1e-3), params)
    state = flat.init(params)
    leaves = [l for l in jax.tree_util.tree_leaves(state) if hasattr(l, "ndim")]
    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert any(l.ndim == 1 and l.size == total for l in leaves)
