"""Shared helpers for the algotrading example models.

Each model computes the same -inf action-mask logits in BOTH its flax
forward and its fused-kernel ``finalize``; keeping the expression in one
place guarantees the two paths can't silently diverge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_FMIN = float(jnp.finfo(jnp.float32).min)

__all__ = ["action_mask_logits"]


def action_mask_logits(obs: dict) -> jax.Array:
    """``[B*, 1, 3]`` additive logits: 0 for valid actions, FMIN-clipped
    ``log(0)`` for masked ones (the reference's -inf masking,
    ``/root/reference/examples/algotrading/models/mlp.py:95-99``)."""
    return jnp.clip(
        jnp.log(obs["action_mask"].astype(jnp.float32)), _FMIN, 0.0
    ).reshape(-1, 1, 3)
