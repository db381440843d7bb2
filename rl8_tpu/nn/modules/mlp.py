"""Multi-layer perceptron.

Flax counterpart of ``/root/reference/src/rl8/nn/modules/mlp.py``: the
final hidden layer is a plain linear projection (no trailing activation),
with optional layer norm and dropout between hidden layers.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax

from .activations import get_activation

__all__ = ["MLP"]


class MLP(nn.Module):
    """Simple multi-layer perceptron.

    Args:
        hiddens: Hidden (and output) layer dimensions. The input dimension
            is inferred from the input, per the flax idiom.
        activation_fn: Hidden activation following each hidden linear
            (or norm) layer.
        layer_norm: Whether to apply layer norm after each hidden linear.
        bias: Whether to include biases.
        dropout: Optional dropout after each hidden activation (requires a
            ``"dropout"`` RNG when not ``deterministic``).

    """

    hiddens: Sequence[int]
    activation_fn: str = "relu"
    layer_norm: bool = False
    bias: bool = True
    dropout: float = 0.0
    #: Compute dtype (params stay f32); ``jnp.bfloat16`` for TPU mixed
    #: precision.
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        act = get_activation(self.activation_fn)
        for hidden in self.hiddens[:-1]:
            x = nn.Dense(hidden, use_bias=self.bias, dtype=self.dtype)(x)
            if self.layer_norm:
                x = nn.LayerNorm(dtype=self.dtype)(x)
            x = act(x)
            if self.dropout:
                x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.hiddens[-1], use_bias=self.bias, dtype=self.dtype)(x)
