"""Policies (counterpart of
``/root/reference/src/rl8/policies/__init__.py``)."""

from ._base import GenericPolicyBase
from ._feedforward import Policy
from ._recurrent import RecurrentPolicy

__all__ = ["GenericPolicyBase", "Policy", "RecurrentPolicy"]
