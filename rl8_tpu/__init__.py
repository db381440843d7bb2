"""rl8-tpu: a TPU-native, high-throughput PPO framework for
infinite-horizon, internally-vectorized environments.

Built with the capabilities of ``theOGognf/rl8`` (public package surface
mirrors ``/root/reference/src/rl8/__init__.py:5-12``), redesigned
TPU-first on JAX/XLA/Pallas/pjit: pure-functional environments, jitted
collect/step programs, and env-axis sharding over device meshes.
"""

from .algorithms import (
    Algorithm,
    AlgorithmConfig,
    RecurrentAlgorithm,
    RecurrentAlgorithmConfig,
)
from .env import Env
from .trainers import RecurrentTrainer, TrainConfig, Trainer

__version__ = "0.5.0"

__all__ = [
    "Algorithm",
    "AlgorithmConfig",
    "Env",
    "RecurrentAlgorithm",
    "RecurrentAlgorithmConfig",
    "RecurrentTrainer",
    "TrainConfig",
    "Trainer",
    "__version__",
]
