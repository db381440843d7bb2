"""Models (counterpart of ``/root/reference/src/rl8/models/__init__.py``)."""

from ._base import GenericModelBase
from ._feedforward import (
    DefaultContinuousModel,
    DefaultDiscreteModel,
    GenericModel,
    Model,
    ModelFactory,
    small_uniform_init,
)
from ._recurrent import (
    DefaultContinuousRecurrentModel,
    DefaultDiscreteRecurrentModel,
    GenericRecurrentModel,
    RecurrentModel,
    RecurrentModelFactory,
)

__all__ = [
    "DefaultContinuousModel",
    "DefaultContinuousRecurrentModel",
    "DefaultDiscreteModel",
    "DefaultDiscreteRecurrentModel",
    "GenericModel",
    "GenericModelBase",
    "GenericRecurrentModel",
    "Model",
    "ModelFactory",
    "RecurrentModel",
    "RecurrentModelFactory",
    "small_uniform_init",
]
