"""Fused GAE scan as a Pallas TPU kernel.

XLA lowers the reverse-time ``lax.scan`` in
``rl8_tpu.nn.functional.generalized_advantage_estimate`` to a sequential
while-loop of tiny elementwise kernels over ``[B, 1]`` operands — one
HBM round-trip per timestep. This kernel instead tiles the env batch
onto the VPU lanes and runs the whole ``T``-step recurrence in VMEM:
one kernel launch, one read of rewards/values, one write of
advantages/returns.

Semantics exactly match the scan implementation (including the
``1 / (reward_scale + 1e-8)`` reward scaling); advantage normalization
stays outside (it's a plain global reduction XLA fuses well).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gae_fits_vmem", "pallas_gae"]

# Env-batch tile width: a multiple of the 128-lane VPU width.
_BLOCK_B = 512


def gae_fits_vmem(horizon: int) -> bool:
    """Whether the kernel's working set fits scoped VMEM for ``horizon``.

    The kernel holds the whole time axis resident — rewards ``[T, 512]``,
    values ``[T+1, 512]``, advantages and returns ``[T, 512]`` — and the
    Pallas pipeline double-buffers the row-tiled blocks, so the footprint
    grows linearly with the horizon against the default 16MB scoped-VMEM
    budget. Callers fall back to the XLA scan beyond it (very large
    horizons are outside the infinite-horizon design's envelope anyway —
    the examples cap at 128–512).
    """
    working = (4 * horizon + 1) * _BLOCK_B * 4
    return 2 * working <= 12 * 1024 * 1024


def _gae_kernel(
    scale_ref,  # [1, 1] SMEM: reward scale
    rewards_ref,  # [T, BLOCK_B] VMEM
    values_ref,  # [T + 1, BLOCK_B] VMEM
    adv_ref,  # [T, BLOCK_B] VMEM out
    ret_ref,  # [T, BLOCK_B] VMEM out
    *,
    gamma: float,
    gae_lambda: float,
    T: int,
):
    inv_scale = 1.0 / (scale_ref[0, 0] + 1e-8)

    def body(i, prev_advantage):
        t = T - 1 - i
        delta = (
            rewards_ref[t, :] * inv_scale
            + gamma * values_ref[t + 1, :]
            - values_ref[t, :]
        )
        advantage = delta + gamma * gae_lambda * prev_advantage
        adv_ref[t, :] = advantage
        ret_ref[t, :] = advantage + values_ref[t, :]
        return advantage

    zeros = jnp.zeros_like(rewards_ref[0, :])
    jax.lax.fori_loop(0, T, body, zeros)


@functools.partial(
    jax.jit, static_argnames=("gamma", "gae_lambda", "interpret")
)
def pallas_gae(
    rewards: jax.Array,
    values: jax.Array,
    reward_scale: jax.Array | float,
    *,
    gamma: float,
    gae_lambda: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Compute unnormalized GAE advantages and returns.

    Args:
        rewards: Time-major ``[T, B, 1]`` rewards.
        values: Time-major ``[T + 1, B, 1]`` value estimates.
        reward_scale: Scalar; rewards are scaled by
            ``1 / (reward_scale + 1e-8)``.
        gamma / gae_lambda: Discount and GAE parameters.
        interpret: Run in the Pallas interpreter (for CPU tests).

    Returns:
        ``(advantages [T, B, 1], returns [T, B, 1])``.

    """
    T, B = rewards.shape[:2]
    r2 = rewards.reshape(T, B).astype(jnp.float32)
    v2 = values.reshape(T + 1, B).astype(jnp.float32)
    # Pad the env batch up to the tile width.
    B_pad = max(_BLOCK_B, ((B + _BLOCK_B - 1) // _BLOCK_B) * _BLOCK_B)
    if B_pad != B:
        r2 = jnp.pad(r2, ((0, 0), (0, B_pad - B)))
        v2 = jnp.pad(v2, ((0, 0), (0, B_pad - B)))
    scale = jnp.asarray(reward_scale, dtype=jnp.float32).reshape(1, 1)

    grid = (B_pad // _BLOCK_B,)
    kernel = functools.partial(
        _gae_kernel, gamma=gamma, gae_lambda=gae_lambda, T=T
    )
    adv, ret = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((T, _BLOCK_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T + 1, _BLOCK_B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, _BLOCK_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, _BLOCK_B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B_pad), jnp.float32),
            jax.ShapeDtypeStruct((T, B_pad), jnp.float32),
        ],
        interpret=interpret,
    )(scale, r2, v2)
    return adv[:, :B].reshape(T, B, 1), ret[:, :B].reshape(T, B, 1)
