"""PPO algorithms (counterpart of
``/root/reference/src/rl8/algorithms/__init__.py``).

The same design thesis applies — environments are internally vectorized
so the train loop needs no external orchestration — but the TPU build
compiles collect and step each into one XLA program and scales across
chips by sharding the env axis over a device mesh (see
``rl8_tpu.parallel``) rather than ignoring distributed computing.
"""

from ._base import GenericAlgorithmBase
from ._feedforward import Algorithm, AlgorithmConfig
from ._recurrent import RecurrentAlgorithm, RecurrentAlgorithmConfig

__all__ = [
    "Algorithm",
    "AlgorithmConfig",
    "GenericAlgorithmBase",
    "RecurrentAlgorithm",
    "RecurrentAlgorithmConfig",
]
