"""Embeddings for sequences.

Flax counterpart of ``/root/reference/src/rl8/nn/modules/embeddings.py``.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PositionalEmbedding"]


def sinusoidal_embedding(max_len: int, embed_dim: int) -> np.ndarray:
    """Classic sin/cos positional embedding table ``[max_len, embed_dim]``."""
    pos = np.arange(max_len)[:, None]
    div = np.exp(-np.log(10_000.0) / embed_dim * np.arange(0, embed_dim, 2))
    pe = np.zeros((max_len, embed_dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    # Odd embed dims have one fewer cos column than sin columns.
    pe[:, 1::2] = np.cos(pos * div)[:, : embed_dim // 2]
    return pe


@functools.lru_cache(maxsize=16)
def _cached_embedding(max_len: int, embed_dim: int) -> np.ndarray:
    """The table is a pure function of its shape — build it once per
    shape instead of on every (eager) forward call and retrace (the
    reference registers it once as a module buffer)."""
    return sinusoidal_embedding(max_len, embed_dim)


class PositionalEmbedding(nn.Module):
    """Add (non-learned) sinusoidal positional embeddings to a sequence.

    Args:
        embed_dim: Input feature dimension.
        max_len: Max input sequence length.
        dropout: Dropout on the output.

    """

    embed_dim: int
    max_len: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        """``x`` has shape ``[B, T, E]``; returns the same shape."""
        pe = jnp.asarray(_cached_embedding(self.max_len, self.embed_dim))
        x = x + pe[None, : x.shape[1], :]
        if self.dropout:
            x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        return x
