"""Embeddings for sequences.

Flax counterpart of ``/root/reference/src/rl8/nn/modules/embeddings.py``.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["OneHotEmbed", "PositionalEmbedding"]


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


class OneHotEmbed(nn.Module):
    """Tiny-vocabulary embedding lookup as a one-hot matmul.

    Drop-in replacement for ``flax.linen.Embed`` (identical parameter
    layout — an ``embedding`` table of shape
    ``[num_embeddings, features]`` with the same default initializer —
    and identical outputs) for *small* vocabularies such as binary
    flags. ``nn.Embed`` lowers to a per-row dynamic gather, which TPUs
    execute row-serially (~1 row/cycle: ~35 µs forward plus a
    scatter-add backward for a 32k-row minibatch); a ``[N, V] @ [V, F]``
    one-hot contraction is a dense VPU/MXU op that XLA fuses into the
    surrounding computation for both forward and backward.

    Args:
        num_embeddings: Vocabulary size (keep small — the one-hot
            contraction does ``V`` MACs per row).
        features: Embedding feature dimension.
        dtype: Optional compute dtype for the contraction (the table is
            stored in f32 like ``nn.Embed``'s default).

    """

    num_embeddings: int
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, idx: jax.Array) -> jax.Array:
        table = self.param(
            "embedding",
            nn.initializers.variance_scaling(
                1.0, "fan_in", "normal", out_axis=0
            ),
            (self.num_embeddings, self.features),
        )
        return one_hot_embed(table, idx, dtype=self.dtype)


def one_hot_embed(
    table: jax.Array, idx: jax.Array, dtype: Any = None
) -> jax.Array:
    """Functional form of :class:`OneHotEmbed` for fused-spec
    ``assemble`` functions that hold the raw flax param tree."""
    if dtype is not None:
        table = table.astype(dtype)
    onehot = jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype)
    return onehot @ table


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
