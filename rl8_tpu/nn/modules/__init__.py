"""Custom flax modules (counterpart of
``/root/reference/src/rl8/nn/modules/__init__.py``)."""

from .activations import ACTIVATIONS, SquaredReLU, get_activation, squared_relu
from .attention import CrossAttention, PointerNetwork, SelfAttention, SelfAttentionStack
from .embeddings import OneHotEmbed, PositionalEmbedding
from .mlp import MLP
from .perceiver import PerceiverIOLayer, PerceiverLayer
from .skip import SequentialSkipConnection

__all__ = [
    "ACTIVATIONS",
    "SquaredReLU",
    "CrossAttention",
    "MLP",
    "PerceiverIOLayer",
    "PerceiverLayer",
    "PointerNetwork",
    "OneHotEmbed",
    "PositionalEmbedding",
    "SelfAttention",
    "SelfAttentionStack",
    "SequentialSkipConnection",
    "get_activation",
    "squared_relu",
]
