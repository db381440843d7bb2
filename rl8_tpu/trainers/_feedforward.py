"""Feedforward trainer (counterpart of
``/root/reference/src/rl8/trainers/_feedforward.py``)."""

from ..algorithms import Algorithm
from ._base import GenericTrainerBase

__all__ = ["Trainer"]


class Trainer(GenericTrainerBase[Algorithm]):
    """Higher-level training interface that interops with experiment
    tracking and policy export.

    This is the preferred training interface for feedforward
    (non-recurrent) policies.
    """
