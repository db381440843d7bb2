"""Perceiver definitions.

Flax counterpart of ``/root/reference/src/rl8/nn/modules/perceiver.py``:
cross-attention into a latent array followed by self-attention stacks
(Perceiver), optionally decoded into a fixed-size output array via a
learned output query (PerceiverIO).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import CrossAttention, SelfAttentionStack

__all__ = ["PerceiverLayer", "PerceiverIOLayer"]


class PerceiverLayer(nn.Module):
    """`Perceiver <https://arxiv.org/abs/2103.03206>`_ layer: cross-attention
    followed by a self-attention stack (reference: ``perceiver.py:10-105``).

    Args:
        embed_dim: Feature dimension of the latent array and input sequence.
        num_heads: Attention heads for cross- and self-attention.
        hidden_dim: Hidden features of post-attention feedforwards.
        num_layers: Self-attention stack depth.
        activation_fn: Activation function ID.
        attention_dropout: Dropout within attention heads.
        hidden_dropout: Feedforward dropout.
        skip_kind: Skip connection kind.
        share_parameters: Whether self-attention layers share parameters.

    """

    embed_dim: int
    num_heads: int = 2
    hidden_dim: int = 128
    num_layers: int = 2
    activation_fn: str = "relu"
    attention_dropout: float = 0.0
    hidden_dropout: float = 0.0
    skip_kind: str = "cat"
    share_parameters: bool = False
    #: Compute dtype (params stay f32); ``jnp.bfloat16`` for TPU AMP.
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        q: jax.Array,
        kv: jax.Array,
        key_padding_mask: None | jax.Array = None,
        attention_mask: None | jax.Array = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        """``q [B, Q, E]`` (latent), ``kv [B, K, E]`` -> ``[B, Q, E]``."""
        latent = CrossAttention(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            hidden_dim=self.hidden_dim,
            activation_fn=self.activation_fn,
            attention_dropout=self.attention_dropout,
            hidden_dropout=self.hidden_dropout,
            skip_kind=self.skip_kind,
            dtype=self.dtype,
            name="cross_attention",
        )(q, kv, key_padding_mask, attention_mask, deterministic=deterministic)
        return SelfAttentionStack(
            embed_dim=self.embed_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            hidden_dim=self.hidden_dim,
            activation_fn=self.activation_fn,
            attention_dropout=self.attention_dropout,
            hidden_dropout=self.hidden_dropout,
            skip_kind=self.skip_kind,
            share_parameters=self.share_parameters,
            dtype=self.dtype,
            name="self_attention",
        )(latent, deterministic=deterministic)


class PerceiverIOLayer(nn.Module):
    """`PerceiverIO <https://arxiv.org/abs/2107.14795>`_ layer: a
    :class:`PerceiverLayer` decoded through a learned output query into a
    fixed output sequence size (reference: ``perceiver.py:108-217``).

    Args:
        embed_dim: Feature dimension of the latent array and input sequence.
        output_seq_dim: Output sequence size the latent array decodes to.
        (remaining args as in :class:`PerceiverLayer`)

    """

    embed_dim: int
    output_seq_dim: int
    num_heads: int = 2
    hidden_dim: int = 128
    num_layers: int = 2
    activation_fn: str = "relu"
    attention_dropout: float = 0.0
    hidden_dropout: float = 0.0
    skip_kind: str = "cat"
    share_parameters: bool = False
    #: Compute dtype (params stay f32); ``jnp.bfloat16`` for TPU AMP.
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        q: jax.Array,
        kv: jax.Array,
        key_padding_mask: None | jax.Array = None,
        attention_mask: None | jax.Array = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        """``q [B, Q, E]`` (latent), ``kv [B, K, E]`` -> ``[B, O, E]``."""
        latent = PerceiverLayer(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            hidden_dim=self.hidden_dim,
            num_layers=self.num_layers,
            activation_fn=self.activation_fn,
            attention_dropout=self.attention_dropout,
            hidden_dropout=self.hidden_dropout,
            skip_kind=self.skip_kind,
            share_parameters=self.share_parameters,
            dtype=self.dtype,
            name="perceiver_layer",
        )(q, kv, key_padding_mask, attention_mask, deterministic=deterministic)
        output_query = self.param(
            "output_query",
            nn.initializers.xavier_uniform(),
            (self.output_seq_dim, self.embed_dim),
        )
        B = q.shape[0]
        output_query = jnp.broadcast_to(
            output_query[None], (B, self.output_seq_dim, self.embed_dim)
        )
        return CrossAttention(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            hidden_dim=self.hidden_dim,
            activation_fn=self.activation_fn,
            attention_dropout=self.attention_dropout,
            hidden_dropout=self.hidden_dropout,
            skip_kind=self.skip_kind,
            dtype=self.dtype,
            name="decoder",
        )(output_query, latent, deterministic=deterministic)
