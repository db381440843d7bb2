"""Data contracts shared between modules: buffer key names, validated
hyperparameter dataclasses, algorithm state, and stat typings.

Mirrors the behavioral contract of ``/root/reference/src/rl8/data.py``
(keys at ``:12-76``, hparams + validation at ``:79-326``, state at
``:329-353``, stat typings at ``:356-463``) with TPU-native adjustments:

- ``device`` is gone — placement is governed by ``jax.sharding``.
- ``enable_amp`` is replaced by bf16 mixed precision (no loss scaling is
  needed on TPU); the flag is kept for config parity and turns on bf16
  compute in the loss path.
- Dynamic algorithm state that must live inside jitted programs (horizon
  counters, reward scale, RNG) is a ``flax.struct`` pytree so the entire
  train step compiles to one XLA program.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Literal, TypedDict

import jax
from flax import struct

__all__ = [
    "DataKeys",
    "AlgorithmHparams",
    "RecurrentAlgorithmHparams",
    "AlgorithmState",
    "RecurrentAlgorithmState",
    "TrainerState",
    "CollectStats",
    "EvalCollectStats",
    "MemoryStats",
    "StepStats",
    "TrainStats",
    "TrainStatKey",
]


class DataKeys:
    """Common identifiers for elements within batches of data.

    Same key set as ``/root/reference/src/rl8/data.py:12-76``.

    Examples:
        >>> from rl8_tpu.data import DataKeys
        >>> (DataKeys.OBS, DataKeys.REWARDS, DataKeys.ACTIONS)
        ('obs', 'rewards', 'actions')

    """

    OBS = "obs"
    REWARDS = "rewards"
    RETURNS = "returns"
    FEATURES = "features"
    ACTIONS = "actions"
    LOGP = "logp"
    VALUES = "values"
    INPUTS = "inputs"
    PADDING_MASK = "padding_mask"
    VIEWS = "views"
    ADVANTAGES = "advantages"
    STATES = "states"
    HIDDEN_STATES = "hidden_states"
    CELL_STATES = "cell_states"
    REVERSED_DISCOUNTED_RETURNS = "reversed_discounted_returns"


@dataclass(frozen=True, kw_only=True)
class AlgorithmHparams:
    """Feedforward PPO hyperparameters, frozen and validated.

    Constraint set mirrors ``/root/reference/src/rl8/data.py:196-270``.
    These are *static* with respect to jit: changing any of them retraces
    the compiled collect/step programs.
    """

    accumulate_grads: bool
    clip_param: float
    dual_clip_param: None | float
    enable_amp: bool
    gae_lambda: float
    gamma: float
    horizon: int
    horizons_per_env_reset: int
    max_grad_norm: float
    normalize_advantages: bool
    normalize_rewards: bool
    num_envs: int
    num_sgd_iters: int
    sgd_minibatch_size: int
    shuffle_minibatches: bool
    shuffle_block_rows: int = 8
    target_kl_div: None | float
    vf_clip_param: float
    vf_coeff: float

    def __post_init__(self) -> None:
        if not (0 < self.clip_param < 1):
            raise ValueError("`clip_param` must be in (0, 1).")
        if self.dual_clip_param is not None and not (self.dual_clip_param > 1):
            raise ValueError("`dual_clip_param` must be `None` or > 1.")
        if not (0 < self.gae_lambda <= 1):
            raise ValueError("`gae_lambda` must be in (0, 1].")
        if not (0 < self.gamma <= 1):
            raise ValueError("`gamma` must be in (0, 1].")
        if not (self.horizon > 0):
            raise ValueError("`horizon` must be > 0.")
        if self.horizons_per_env_reset == 0:
            raise ValueError("`horizons_per_env_reset` must be nonzero.")
        if not (self.max_grad_norm > 0):
            raise ValueError("`max_grad_norm` must be > 0.")
        if not (self.num_sgd_iters > 0):
            raise ValueError("`num_sgd_iters` must be > 0.")
        if not (self.sgd_minibatch_size > 0):
            raise ValueError("`sgd_minibatch_size` must be > 0.")
        if not (self.shuffle_block_rows > 0):
            raise ValueError("`shuffle_block_rows` must be > 0.")
        if self.target_kl_div is not None and self.accumulate_grads:
            raise ValueError(
                "KL-based early stopping (`target_kl_div`) can't be combined with"
                " gradient accumulation."
            )
        if self.target_kl_div is not None and not (self.target_kl_div > 0):
            raise ValueError("`target_kl_div` must be > 0.")
        if not (self.vf_clip_param > 0):
            raise ValueError("`vf_clip_param` must be > 0.")
        if not (self.vf_coeff > 0):
            raise ValueError("`vf_coeff` must be > 0.")
        if self.accumulate_grads and (self.num_minibatches == 1):
            raise ValueError(
                "With a whole-buffer minibatch there is nothing to"
                " accumulate over: `accumulate_grads=True` requires more than"
                " one minibatch. Shrink `sgd_minibatch_size` or disable"
                " `accumulate_grads`."
            )

    @property
    def num_minibatches(self) -> int:
        return (self.num_envs * self.horizon) // self.sgd_minibatch_size

    @property
    def effective_shuffle_block(self) -> int:
        """Rows per epoch-shuffle unit, clamped so blocks never straddle
        a minibatch boundary: ``gcd(shuffle_block_rows,
        sgd_minibatch_size)``. TPU gathers pay a fixed per-row cost, so
        permuting 8-row blocks instead of single rows makes the per-epoch
        minibatch shuffle ~8x cheaper; 1 restores the reference's exact
        row-level uniform shuffle (see PARITY.md)."""
        return math.gcd(self.shuffle_block_rows, self.sgd_minibatch_size)

    def validate(self) -> "AlgorithmHparams":
        """Cross-field validation deferred past ``__post_init__``."""
        if (self.num_envs * self.horizon) % self.sgd_minibatch_size:
            raise ValueError(
                "`sgd_minibatch_size` must divide `num_envs * horizon` evenly."
            )
        return self


@dataclass(frozen=True, kw_only=True)
class RecurrentAlgorithmHparams(AlgorithmHparams):
    """Recurrent PPO hyperparameters.

    Constraint set mirrors ``/root/reference/src/rl8/data.py:291-326``.
    """

    seq_len: int
    seqs_per_state_reset: int

    def __post_init__(self) -> None:
        super().__post_init__()
        if not (self.seq_len > 0):
            raise ValueError("`seq_len` must be > 0.")
        if self.horizon % self.seq_len:
            raise ValueError("`seq_len` must be a factor of `horizon`.")
        if self.seqs_per_state_reset == 0:
            raise ValueError("`seqs_per_state_reset` must be nonzero.")
        if (self.horizon * self.horizons_per_env_reset) % (
            self.seq_len * self.seqs_per_state_reset
        ):
            raise ValueError(
                "`seq_len * seqs_per_state_reset` must be a factor of"
                " `horizon * horizons_per_env_reset`."
            )

    @property
    def num_minibatches(self) -> int:
        return (self.num_envs * (self.horizon // self.seq_len)) // self.sgd_minibatch_size

    def validate(self) -> "RecurrentAlgorithmHparams":
        if (self.num_envs * (self.horizon // self.seq_len)) % self.sgd_minibatch_size:
            raise ValueError(
                "`sgd_minibatch_size` must be a factor of"
                " `num_envs * (horizon // seq_len)`."
            )
        return self


class AlgorithmState(struct.PyTreeNode):
    """Dynamic feedforward PPO state threaded through the jitted train loop.

    Counterpart of ``/root/reference/src/rl8/data.py:329-345``, extended
    with the state the reference keeps in mutable Python objects (RNG,
    params, optimizer state, env state, carried buffer tails) so that
    collect/step are pure functions of this pytree.
    """

    #: Model parameters (a flax params pytree).
    params: Any
    #: Optax optimizer state.
    opt_state: Any
    #: Environment state pytree.
    env_state: Any
    #: PRNG key consumed/split by collect and step.
    rng: jax.Array
    #: Time-major rollout buffer pytree, or carried tails between steps.
    buffer: Any
    #: Number of horizons collected (drives env-reset cadence).
    horizons: jax.Array
    #: Whether `collect` ran since the last `step` (guards dummy data).
    buffered: jax.Array
    #: Reward scale (std of reversed discounted returns) for normalization.
    reward_scale: jax.Array


class RecurrentAlgorithmState(AlgorithmState):
    """Recurrent PPO dynamic state (adds the sequence counter;
    counterpart of ``/root/reference/src/rl8/data.py:348-353``)."""

    #: Number of recurrent sequences transitioned during training.
    seqs: jax.Array


TrainerState = TypedDict(
    "TrainerState",
    {
        "algorithm/collects": int,
        "algorithm/steps": int,
        "env/steps": int,
    },
)

CollectStats = TypedDict(
    "CollectStats",
    {
        "env/resets": int,
        "env/steps": int,
        "profiling/collect_ms": float,
        "returns/min": float,
        "returns/max": float,
        "returns/mean": float,
        "returns/std": float,
        "rewards/min": float,
        "rewards/max": float,
        "rewards/mean": float,
        "rewards/std": float,
    },
    total=False,
)

EvalCollectStats = TypedDict(
    "EvalCollectStats",
    {
        "eval/env/resets": int,
        "eval/env/steps": int,
        "eval/profiling/collect_ms": float,
        "eval/returns/min": float,
        "eval/returns/max": float,
        "eval/returns/mean": float,
        "eval/returns/std": float,
        "eval/rewards/min": float,
        "eval/rewards/max": float,
        "eval/rewards/mean": float,
        "eval/rewards/std": float,
    },
    total=False,
)

MemoryStats = TypedDict(
    "MemoryStats",
    {
        "memory/free": int,
        "memory/total": int,
        "memory/percent": float,
    },
    total=False,
)

StepStats = TypedDict(
    "StepStats",
    {
        "coefficients/entropy": float,
        "coefficients/vf": float,
        "losses/entropy": float,
        "losses/policy": float,
        "losses/vf": float,
        "losses/total": float,
        "monitors/kl_div": float,
        "profiling/step_ms": float,
    },
    total=False,
)


class TrainStats(CollectStats, MemoryStats, StepStats, TrainerState):
    ...


TrainStatKey = Literal[
    "algorithm/collects",
    "algorithm/steps",
    "env/resets",
    "env/steps",
    "profiling/collect_ms",
    "returns/min",
    "returns/max",
    "returns/mean",
    "returns/std",
    "rewards/min",
    "rewards/max",
    "rewards/mean",
    "rewards/std",
    "coefficients/entropy",
    "coefficients/vf",
    "losses/entropy",
    "losses/policy",
    "losses/vf",
    "losses/total",
    "memory/free",
    "memory/total",
    "memory/percent",
    "monitors/kl_div",
    "profiling/step_ms",
]
