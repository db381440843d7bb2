"""Distribution math shared by the fused kernels.

Single source of truth for the in-kernel counterparts of
``rl8_tpu/distributions.py`` (which mirrors
``/root/reference/src/rl8/distributions.py``): the fused update kernel
(``ops/fused_ppo.py``) and the fused act kernel (``ops/fused_act.py``)
must agree bit-for-bit on log-prob formulas — the PPO ratio divides one
by the other.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "LOG_2PI",
    "SQUASH_EPS",
    "normal_per_dim_logp",
    "squashed_normal_logp",
]

LOG_2PI = 1.8378770664093453

#: float32 machine epsilon — the reference's atanh clamp margin
#: (``distributions.py:147-170``).
SQUASH_EPS = 1.1920929e-07


def normal_per_dim_logp(
    diff: jax.Array, log_std: jax.Array, inv_var: jax.Array
) -> jax.Array:
    """Per-dimension diagonal-normal log-prob where ``diff = x - mean``
    and ``inv_var = exp(-2 log_std)`` (``distributions.py:137-146``)."""
    return -0.5 * diff * diff * inv_var - log_std - 0.5 * LOG_2PI


def squashed_normal_logp(
    actions: jax.Array, mean: jax.Array, log_std: jax.Array, inv_var: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """SquashedNormal log-prob of tanh-squashed ``actions``
    (``distributions.py:147-170``): invert via clamped atanh, clamp the
    per-dim base log-prob to ±100, subtract the tanh log-det term.

    Returns:
        ``(logp [N, 1], diff, grad_gate)`` where ``diff = atanh(a) -
        mean`` and ``grad_gate`` is 1 where the ±100 clamp passes
        gradients (the clamp zeroes them outside).

    """
    clipped = jnp.clip(actions, -1.0 + SQUASH_EPS, 1.0 - SQUASH_EPS)
    u = 0.5 * (jnp.log1p(clipped) - jnp.log1p(-clipped))
    diff = u - mean
    per_dim = normal_per_dim_logp(diff, log_std, inv_var)
    grad_gate = ((per_dim > -100.0) & (per_dim < 100.0)).astype(jnp.float32)
    logp = jnp.sum(
        jnp.clip(per_dim, -100.0, 100.0), axis=1, keepdims=True
    ) - jnp.sum(
        jnp.log(1.0 - actions * actions + SQUASH_EPS), axis=1, keepdims=True
    )
    return logp, diff, grad_gate
