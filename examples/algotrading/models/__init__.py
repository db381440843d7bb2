"""Custom algotrading models
(``/root/reference/examples/algotrading/models/__init__.py``)."""

from .lstm import LazyLemur
from .mlp import MischievousMule
from .transformer import AttentiveAlpaca

__all__ = ["AttentiveAlpaca", "LazyLemur", "MischievousMule"]
