"""Skip connection modules.

Flax counterpart of ``/root/reference/src/rl8/nn/modules/skip.py``. The
reference's mutable ``append`` API doesn't fit flax's declarative module
model, so layers are supplied up front; the skip/fan-in structure is
identical: for ``kind="cat"`` a fan-in linear restores the embedding
dimension after each concatenation.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax

from ..functional import skip_connection

__all__ = ["SequentialSkipConnection"]


class SequentialSkipConnection(nn.Module):
    """Sequential skip connection through a series of layers.

    The forward pass first skip-connects the two seeds ``x`` and ``y``,
    then for each provided layer applies (fan-in if ``"cat"``), a skip
    connection between the running value and the layer's output, and a
    final fan-in — matching the layer interleaving of the reference's
    ``SequentialSkipConnection.forward``
    (``/root/reference/src/rl8/nn/modules/skip.py:96-118``).

    Args:
        embed_dim: Original input feature size (the output size as well).
        kind: ``"residual"`` (sum), ``"cat"`` (concatenate + fan-in
            linear), or ``None`` (pass-through).
        layers: Module constructors to thread skip connections through.

    """

    embed_dim: int
    kind: None | str = "cat"
    layers: Sequence[Callable[[], nn.Module]] = ()
    #: Compute dtype for the fan-in linears (params stay f32).
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        y = skip_connection(x, y, kind=self.kind)
        for make_layer in self.layers:
            if self.kind == "cat":
                y = nn.Dense(self.embed_dim, dtype=self.dtype)(y)
            layer = make_layer()
            y = skip_connection(y, layer(y), kind=self.kind)
        if self.kind == "cat" and self.layers:
            y = nn.Dense(self.embed_dim, dtype=self.dtype)(y)
        return y
