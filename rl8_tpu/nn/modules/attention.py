"""Attention modules.

Flax counterpart of ``/root/reference/src/rl8/nn/modules/attention.py``,
built on ``nn.MultiHeadDotProductAttention`` (which XLA lowers onto the
MXU) instead of ``torch.nn.MultiheadAttention``.

Mask conventions (consistent across this module):

- ``key_padding_mask [B, K]``: ``True`` marks PADDED/INVALID key
  positions (same as the reference and ``views.PaddedRollingWindow``).
- ``attention_mask [Q, K]``: ``True`` marks pairs that MAY attend.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..functional import masked_log_softmax
from .activations import get_activation
from .skip import SequentialSkipConnection

__all__ = ["PointerNetwork", "CrossAttention", "SelfAttention", "SelfAttentionStack"]


class PointerNetwork(nn.Module):
    """3D attention for selecting the next encoder element to append to a
    decoder sequence (`Pointer Networks <https://arxiv.org/abs/1506.03134>`_;
    reference: ``attention.py:14-79``).

    Args:
        embed_dim: Feature dimension of the encoders/decoders.

    """

    embed_dim: int

    @nn.compact
    def __call__(
        self,
        decoder_out: jax.Array,
        encoder_out: jax.Array,
        mask: None | jax.Array = None,
    ) -> jax.Array:
        """Return logits ``[B, D, E]`` scoring each encoder element per
        decoder element.

        Args:
            decoder_out: ``[B, D, C]`` decoder features.
            encoder_out: ``[B, E, C]`` encoder features.
            mask: ``[B, D, E]`` selectability mask (``True`` = selectable).

        """
        w1 = nn.Dense(self.embed_dim, use_bias=False, name="W1")
        w2 = nn.Dense(self.embed_dim, use_bias=False, name="W2")
        vt = nn.Dense(1, use_bias=False, name="VT")
        # [B, 1, E, C] + [B, D, 1, C] -> [B, D, E, C]
        encoder_proj = w1(encoder_out)[:, None, :, :]
        decoder_proj = w2(decoder_out)[:, :, None, :]
        weights = vt(jnp.tanh(decoder_proj + encoder_proj))[..., 0]
        return masked_log_softmax(weights, mask=mask, dim=-1)


def _combine_masks(
    B: int,
    Q: int,
    K: int,
    key_padding_mask: None | jax.Array,
    attention_mask: None | jax.Array,
) -> None | jax.Array:
    """Build a flax attention mask ``[B, 1, Q, K]`` (True = attend)."""
    mask = None
    if key_padding_mask is not None:
        mask = ~key_padding_mask.astype(bool)[:, None, None, :]
        mask = jnp.broadcast_to(mask, (B, 1, Q, K))
    if attention_mask is not None:
        am = attention_mask.astype(bool)[None, None, :, :]
        mask = am if mask is None else (mask & am)
    return mask


class _FFN(nn.Module):
    """Post-attention feedforward: LayerNorm -> Dense -> act -> Dropout ->
    Dense back to the input width."""

    hidden_dim: int
    out_dim: int
    activation_fn: str
    dropout: float
    deterministic: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = get_activation(self.activation_fn)(x)
        x = nn.Dropout(rate=self.dropout, deterministic=self.deterministic)(x)
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)


class _SmallWindowAttention(nn.Module):
    """Batch-last multihead attention for TINY windows — parameter- and
    numerics-compatible with ``nn.MultiHeadDotProductAttention`` (same
    submodule names/shapes, same query scaling and masking constant).

    Why it exists: TPU vector memory tiles are ``[8 sublanes, 128
    lanes]`` over the two MINOR dims. The standard attention layout puts
    the window/head dims minor (``[B, H, S, S]`` scores, ``[B, S, H,
    dh]`` projections), so with S≈5 and dh≈2 every elementwise op,
    mask, and softmax moves 16-64x its logical bytes through HBM —
    measured 13x throughput loss on the algotrading AttentiveAlpaca
    model (docs/performance.md § custom-model ablation). This
    implementation transposes once to put the BATCH dim in lanes
    (``[H, S, S, B]`` scores), unrolls the tiny window sums (head_dim
    and window terms are Python loops over 2-8 elements), and keeps the
    big q/k/v/out projections row-major for the MXU. Only the layout
    changes; the math is flax's, so outputs match the flax path to
    float-reassociation tolerance (pinned in tests/test_nn).
    """

    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        q: jax.Array,
        kv: jax.Array,
        mask: None | jax.Array = None,
    ) -> jax.Array:
        """``q [B, Q, E]``, ``kv [B, K, E]``, ``mask [B, 1, Q, K]``
        (True = may attend) -> ``[B, Q, E]``."""
        B, Q, E = q.shape
        K = kv.shape[1]
        H = self.num_heads
        dh = E // H
        proj = partial(
            nn.DenseGeneral, features=(H, dh), axis=-1, dtype=self.dtype
        )
        qh = proj(name="query")(q)  # [B, Q, H, dh]
        kh = proj(name="key")(kv)  # [B, K, H, dh]
        vh = proj(name="value")(kv)
        qh = qh / jnp.sqrt(jnp.asarray(dh, dtype=qh.dtype))
        # One transpose each to batch-last [H, dh, S, B]; everything
        # downstream is lane-parallel over B.
        qt = qh.transpose(2, 3, 1, 0)
        kt = kh.transpose(2, 3, 1, 0)
        vt = vh.transpose(2, 3, 1, 0)
        # scores[h, i, j, b] = sum_d q[h, d, i, b] * k[h, d, j, b]
        scores = qt[:, 0, :, None, :] * kt[:, 0, None, :, :]
        for d in range(1, dh):
            scores = scores + qt[:, d, :, None, :] * kt[:, d, None, :, :]
        if mask is not None:
            m = mask[:, 0].transpose(1, 2, 0)  # [Q, K, B]
            big_neg = jnp.finfo(scores.dtype).min
            scores = jnp.where(m[None], scores, big_neg)
        p = jax.nn.softmax(scores, axis=2)  # over keys j
        # out[h, d, i, b] = sum_j p[h, i, j, b] * v[h, d, j, b]
        out = p[:, None, :, 0, :] * vt[:, :, None, 0, :]
        for j in range(1, K):
            out = out + p[:, None, :, j, :] * vt[:, :, None, j, :]
        out = out.transpose(3, 2, 0, 1)  # [B, Q, H, dh]
        return nn.DenseGeneral(
            features=E, axis=(-2, -1), dtype=self.dtype, name="out"
        )(out)


#: Window/feature bounds under which the batch-last layout wins: both
#: attention dims far below the 128-lane tile and a head_dim far below
#: the 8-sublane tile. Above these, flax's MXU-shaped layout is right.
_SMALL_WINDOW_MAX_SEQ = 16
_SMALL_WINDOW_MAX_EMBED = 64


class _AttentionBlock(nn.Module):
    """Shared attention + feedforward + skip structure used by both
    cross- and self-attention (reference: ``attention.py:82-195``)."""

    embed_dim: int
    num_heads: int = 2
    hidden_dim: int = 128
    activation_fn: str = "relu"
    attention_dropout: float = 0.0
    hidden_dropout: float = 0.0
    skip_kind: None | str = "cat"
    #: Self-attention shares one norm between q and kv (the reference's
    #: SelfAttention has a single LayerNorm); cross-attention norms them
    #: separately. STATIC so the parameter structure never depends on
    #: whether a caller happened to pass the same array object twice.
    self_attention: bool = False
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
        q_normed = nn.LayerNorm(dtype=self.dtype, name="q_norm")(q)
        kv_normed = (
            q_normed
            if self.self_attention
            else nn.LayerNorm(dtype=self.dtype, name="kv_norm")(kv)
        )
        mask = _combine_masks(
            q.shape[0], q.shape[1], kv.shape[1], key_padding_mask, attention_mask
        )
        # Tiny windows take the batch-last layout (parameter-compatible,
        # numerics match to reassociation); attention dropout needs
        # flax's in-kernel RNG plumbing, so it stays on the flax path.
        small = (
            q.shape[1] <= _SMALL_WINDOW_MAX_SEQ
            and kv.shape[1] <= _SMALL_WINDOW_MAX_SEQ
            and q.shape[-1] <= _SMALL_WINDOW_MAX_EMBED
            and q.shape[-1] % self.num_heads == 0
            and (self.attention_dropout == 0.0 or deterministic)
        )
        if small:
            attn = _SmallWindowAttention(
                num_heads=self.num_heads, dtype=self.dtype, name="attention"
            )(q_normed, kv_normed, mask=mask)
        else:
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                dropout_rate=self.attention_dropout,
                deterministic=deterministic,
                dtype=self.dtype,
                name="attention",
            )(q_normed, kv_normed, kv_normed, mask=mask)

        # The FFN's width matches the value entering the skip connection:
        # embed_dim after the fan-in for "cat", embed_dim for "residual"/None
        # — but for "cat" the FFN runs *after* the fan-in, so its IO width is
        # embed_dim in all cases.
        def make_mlp() -> nn.Module:
            return _FFN(
                hidden_dim=self.hidden_dim,
                out_dim=self.embed_dim,
                activation_fn=self.activation_fn,
                dropout=self.hidden_dropout,
                deterministic=deterministic,
                dtype=self.dtype,
            )

        return SequentialSkipConnection(
            embed_dim=self.embed_dim,
            kind=self.skip_kind,
            layers=(make_mlp,),
            dtype=self.dtype,
            name="skip_connection",
        )(q, attn)


class CrossAttention(nn.Module):
    """Multihead cross-attention mapping keys of length ``K`` to a query of
    length ``Q`` (reference: ``attention.py:82-195``).

    Args:
        embed_dim: Key and query feature dimension.
        num_heads: Number of attention heads.
        hidden_dim: Hidden features of the post-attention feedforward.
        activation_fn: Activation function ID.
        attention_dropout: Dropout within attention heads.
        hidden_dropout: Feedforward dropout.
        skip_kind: Skip connection kind between attention and feedforward.

    """

    embed_dim: int
    num_heads: int = 2
    hidden_dim: int = 128
    activation_fn: str = "relu"
    attention_dropout: float = 0.0
    hidden_dropout: float = 0.0
    skip_kind: None | str = "cat"
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
        """``q [B, Q, E]``, ``kv [B, K, E]`` -> ``[B, Q, E]``."""
        return _AttentionBlock(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            hidden_dim=self.hidden_dim,
            activation_fn=self.activation_fn,
            attention_dropout=self.attention_dropout,
            hidden_dropout=self.hidden_dropout,
            skip_kind=self.skip_kind,
            dtype=self.dtype,
            name="block",
        )(q, kv, key_padding_mask, attention_mask, deterministic=deterministic)


class SelfAttention(nn.Module):
    """Multihead self-attention over a sequence (reference:
    ``attention.py:198-303``). Same args as :class:`CrossAttention`."""

    embed_dim: int
    num_heads: int = 2
    hidden_dim: int = 128
    activation_fn: str = "relu"
    attention_dropout: float = 0.0
    hidden_dropout: float = 0.0
    skip_kind: None | str = "cat"
    #: Compute dtype (params stay f32); ``jnp.bfloat16`` for TPU AMP.
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        key_padding_mask: None | jax.Array = None,
        attention_mask: None | jax.Array = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        """``x [B, X, E]`` -> ``[B, X, E]``."""
        return _AttentionBlock(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            hidden_dim=self.hidden_dim,
            activation_fn=self.activation_fn,
            attention_dropout=self.attention_dropout,
            hidden_dropout=self.hidden_dropout,
            skip_kind=self.skip_kind,
            self_attention=True,
            dtype=self.dtype,
            name="block",
        )(x, x, key_padding_mask, attention_mask, deterministic=deterministic)


class SelfAttentionStack(nn.Module):
    """Stacked self-attention layers (reference: ``attention.py:306-358``).

    Args:
        embed_dim/num_heads/...: Configuration for each layer.
        num_layers: Number of layers.
        share_parameters: Whether all layers share one set of parameters.

    """

    embed_dim: int
    num_layers: int = 2
    num_heads: int = 2
    hidden_dim: int = 128
    activation_fn: str = "relu"
    attention_dropout: float = 0.0
    hidden_dropout: float = 0.0
    skip_kind: None | str = "cat"
    share_parameters: bool = False
    #: Compute dtype (params stay f32); ``jnp.bfloat16`` for TPU AMP.
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        key_padding_mask: None | jax.Array = None,
        attention_mask: None | jax.Array = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        make = partial(
            SelfAttention,
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            hidden_dim=self.hidden_dim,
            activation_fn=self.activation_fn,
            attention_dropout=self.attention_dropout,
            hidden_dropout=self.hidden_dropout,
            skip_kind=self.skip_kind,
            dtype=self.dtype,
        )
        out = x
        shared = make(name="layers_shared") if self.share_parameters else None
        for i in range(self.num_layers):
            layer = shared if shared is not None else make(name=f"layers_{i}")
            out = layer(
                out, key_padding_mask, attention_mask, deterministic=deterministic
            )
        return out
