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
    "TWO_PI",
    "kernel_uniform",
    "key_to_seed",
    "log_softmax_rows",
    "normal_per_dim_logp",
    "sample_categorical_group",
    "sample_continuous_actions",
    "sample_discrete_actions",
    "sample_normal_noise",
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
        jnp.log(1.0 - clipped * clipped + SQUASH_EPS), axis=1, keepdims=True
    )
    return logp, diff, grad_gate


TWO_PI = 6.283185307179586


def kernel_uniform(shape: tuple[int, ...]) -> jax.Array:
    """Uniform in (0, 1) from the TPU hardware PRNG (kernel context;
    seed with ``pltpu.prng_seed`` first).

    Mosaic has no uint32->float32 convert, so build a float in [1, 2)
    by splicing 23 random mantissa bits under the exponent of 1.0 and
    subtract 1 (clamped away from exact 0 for the log transforms)."""
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    mant = (bits >> 9) | jnp.uint32(0x3F800000)
    return jnp.maximum(pltpu.bitcast(mant, jnp.float32) - 1.0, 1e-7)


def log_softmax_rows(z: jax.Array) -> jax.Array:
    """Numerically-stable log-softmax over the last axis (the shared
    in-kernel formula — act and update kernels must agree bit-for-bit)."""
    m = jnp.max(z, axis=1, keepdims=True)
    return z - (m + jnp.log(jnp.sum(jnp.exp(z - m), axis=1, keepdims=True)))


def sample_categorical_group(
    z_logp: jax.Array, deterministic: bool
) -> tuple[jax.Array, jax.Array]:
    """Sample one categorical group from row-wise log-probs ``[N, n]``
    via Gumbel-argmax; returns ``(action [N, 1] int32, chosen logp)``."""
    if deterministic:
        scores = z_logp
    else:
        u = kernel_uniform(z_logp.shape)
        scores = z_logp - jnp.log(-jnp.log(u))
    act = jnp.argmax(scores, axis=1).astype(jnp.int32).reshape(-1, 1)
    oh = jax.lax.broadcasted_iota(jnp.int32, z_logp.shape, 1) == act
    chosen = jnp.sum(jnp.where(oh, z_logp, 0.0), axis=1, keepdims=True)
    return act, chosen


def sample_normal_noise(shape: tuple[int, ...]) -> jax.Array:
    """Standard-normal noise via Box-Muller from the hardware PRNG."""
    u1 = kernel_uniform(shape)
    u2 = kernel_uniform(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(TWO_PI * u2)


def sample_discrete_actions(
    logits: jax.Array, n: int, deterministic: bool, actions_ref
) -> jax.Array:
    """Sample every categorical group of ``logits`` (``[N, A * n]``,
    ``n`` categories per group), writing one int32 column per group
    into ``actions_ref``; returns the summed chosen log-prob ``[N, 1]``.

    The single in-kernel discrete sampling path — both act kernels
    (feedforward and recurrent) inline this, so the stored log-probs the
    PPO ratio divides by can never diverge between them.
    """
    total_logp = None
    for a in range(logits.shape[1] // n):
        z = log_softmax_rows(logits[:, a * n : (a + 1) * n])
        act, chosen = sample_categorical_group(z, deterministic)
        total_logp = chosen if total_logp is None else total_logp + chosen
        actions_ref[:, a : a + 1] = act
    return total_logp


def sample_continuous_actions(
    mean: jax.Array,
    pre_log_std: jax.Array,
    deterministic: bool,
    squashed: bool,
) -> tuple[jax.Array, jax.Array]:
    """Sample diagonal-normal (optionally tanh-squashed) actions from
    raw head outputs; returns ``(actions, logp [N, 1])``.

    Applies the default models' ``tanh``-bounded log-std
    (``models/_feedforward.py``), Box-Muller noise, and the same logp
    formulas as the fused update kernels — the single in-kernel
    continuous sampling path for both act kernels.
    """
    log_std = jnp.tanh(pre_log_std)
    std = jnp.exp(log_std)
    inv_var = jnp.exp(-2.0 * log_std)
    if deterministic:
        actions = mean
    else:
        actions = mean + std * sample_normal_noise(mean.shape)
    if squashed:
        # SquashedNormal: squash through tanh and store the logp of the
        # squashed action so stored log-probs match
        # ``SquashedNormal.logp(actions)``.
        actions = jnp.tanh(actions)
        logp, _, _ = squashed_normal_logp(actions, mean, log_std, inv_var)
    else:
        diff = actions - mean
        logp = jnp.sum(
            normal_per_dim_logp(diff, log_std, inv_var),
            axis=1,
            keepdims=True,
        )
    return actions, logp


def key_to_seed(key: jax.Array) -> jax.Array:
    """Two 32-bit seed words for the TPU hardware PRNG from a JAX key.

    Both words of the key material are fed through (a single word would
    collide by birthday bound over long runs); kernels further mix in
    their grid position.
    """
    kd = jax.random.key_data(key).astype(jnp.uint32).ravel()
    return jnp.stack([kd[0], kd[-1]]).astype(jnp.int32)
