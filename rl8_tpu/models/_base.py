"""Base model definitions.

Counterpart of ``/root/reference/src/rl8/models/_base.py``. Models are
flax modules whose ``__call__`` is *pure*: instead of caching the value
estimate on the module and exposing ``value_function()``
(``models/_base.py:60-86``), the forward pass returns
``(features, values)`` (and recurrent states for recurrent models)
directly — the functional idiom required for jit/grad.
"""

from __future__ import annotations

import flax.linen as nn

from ..specs import Spec

__all__ = ["GenericModelBase"]


class GenericModelBase(nn.Module):
    """Base class for feedforward and recurrent models.

    Fields (static with respect to jit):
        observation_spec: Spec defining the forward pass input.
        action_spec: Spec defining the outputs of the policy's action
            distribution that this model is a component of.

    """

    observation_spec: Spec
    action_spec: Spec
