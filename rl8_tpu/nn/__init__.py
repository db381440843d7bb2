"""Top-level NN extensions (counterpart of
``/root/reference/src/rl8/nn/__init__.py``)."""

from .functional import (
    binary_mask_to_float_mask,
    float_mask_to_binary_mask,
    generalized_advantage_estimate,
    mask_from_lengths,
    masked_avg,
    masked_categorical_sample,
    masked_log_softmax,
    masked_max,
    ppo_losses,
    skip_connection,
)
from .modules import (
    ACTIVATIONS,
    MLP,
    CrossAttention,
    PerceiverIOLayer,
    PerceiverLayer,
    PointerNetwork,
    PositionalEmbedding,
    SelfAttention,
    SelfAttentionStack,
    SequentialSkipConnection,
    get_activation,
    squared_relu,
)

__all__ = [
    "ACTIVATIONS",
    "CrossAttention",
    "MLP",
    "PerceiverIOLayer",
    "PerceiverLayer",
    "PointerNetwork",
    "PositionalEmbedding",
    "SelfAttention",
    "SelfAttentionStack",
    "SequentialSkipConnection",
    "binary_mask_to_float_mask",
    "float_mask_to_binary_mask",
    "generalized_advantage_estimate",
    "get_activation",
    "mask_from_lengths",
    "masked_avg",
    "masked_categorical_sample",
    "masked_log_softmax",
    "masked_max",
    "ppo_losses",
    "skip_connection",
    "squared_relu",
]
