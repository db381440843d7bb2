"""Environment protocol and dummy environments.

TPU-native redesign of ``/root/reference/src/rl8/env.py``. The reference
defines a *stateful* IsaacGym-style environment object whose ``reset``/
``step`` mutate internal tensors (``env.py:16-128``). Under XLA the hot
loop is a single compiled ``lax.scan``, so environments here are **pure
functions over an explicit state pytree**:

- ``reset(key, *, state=None, config=None) -> (state, obs)``
- ``step(state, action) -> (state, obs, reward)``

One ``Env`` instance still simulates ``num_envs`` parallel instances in
lockstep as batched arrays (the reference's core thesis,
``env.py:34-43``); the instance itself only holds *static* metadata
(specs, ``num_envs``, ``horizon``) so it can be closed over by jit.

``config`` is a mapping of (traceable) scalars supporting per-reset
domain randomization like the reference's reset-config dicts
(``env.py:100-114``). Config values persist across resets via the state
pytree, mirroring how ``DummyEnv.reset`` persists ``bounds``
(``env.py:197-199``).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, ClassVar, Protocol

import jax
import jax.numpy as jnp

from .data import DataKeys
from .specs import Discrete, Spec, Unbounded

__all__ = [
    "Env",
    "EnvFactory",
    "GenericEnv",
    "DummyEnv",
    "ContinuousDummyEnv",
    "DiscreteDummyEnv",
]

EnvState = Any
EnvConfig = dict[str, Any] | None


class Env(ABC):
    """Protocol for highly parallelized, infinite-horizon environments.

    Functional counterpart of ``/root/reference/src/rl8/env.py:16-128``.
    Subclasses must define :attr:`observation_spec` and
    :attr:`action_spec` plus the pure :meth:`reset` and :meth:`step`.

    Args:
        num_envs: Number of parallel, independent environment instances
            simulated in lockstep by this one object.
        horizon: Number of steps the environment expects to take before
            being reset. ``None`` suggests the environment may never reset.

    """

    #: Spec defining the environment's inputs (actions).
    action_spec: Spec

    #: Spec defining the environment's observation outputs.
    observation_spec: Spec

    #: Optional cap on ``horizon``, validated at construction
    #: (``/root/reference/src/rl8/env.py:84-89``).
    max_horizon: ClassVar[int]

    #: Optional cap on ``num_envs``, validated at construction
    #: (``/root/reference/src/rl8/env.py:90-95``).
    max_num_envs: ClassVar[int]

    #: Number of parallel and independent environments being simulated.
    num_envs: int

    #: Expected steps per reset; ``None`` = may never reset.
    horizon: None | int

    def __init__(self, num_envs: int, /, horizon: None | int = None) -> None:
        if hasattr(self, "max_horizon") and horizon is not None:
            if not (horizon <= self.max_horizon):
                raise ValueError(
                    f"{self.__class__.__name__} `horizon` must be <= {self.max_horizon}."
                )
        if hasattr(self, "max_num_envs"):
            if not (num_envs <= self.max_num_envs):
                raise ValueError(
                    f"{self.__class__.__name__} `num_envs` must be <= {self.max_num_envs}."
                )
        self.num_envs = num_envs
        self.horizon = horizon

    @abstractmethod
    def reset(
        self,
        key: jax.Array,
        *,
        state: EnvState = None,
        config: EnvConfig = None,
    ) -> tuple[EnvState, Any]:
        """Reset the environment, returning fresh state and the initial
        observation (spec :attr:`observation_spec`, batch ``[num_envs, ...]``).

        Args:
            key: PRNG key for stochastic initialization.
            state: Previous state pytree, if any. Lets per-reset config
                (domain randomization) persist when ``config`` is ``None``.
            config: Optional configuration/options/parameters applied to
                this reset.

        """

    @abstractmethod
    def step(self, state: EnvState, action: Any) -> tuple[EnvState, Any, jax.Array]:
        """Apply an action (spec :attr:`action_spec`) and simulate one
        transition.

        Returns:
            ``(new_state, obs, rewards)`` where ``rewards`` has shape
            ``[num_envs, 1]``.

        """


class EnvFactory(Protocol):
    """Factory protocol describing how to create an environment instance
    (``/root/reference/src/rl8/env.py:131-151``)."""

    max_horizon: ClassVar[int]
    max_num_envs: ClassVar[int]

    def __call__(self, num_envs: int, /, horizon: None | int = None) -> Env:
        ...


class GenericEnv(Env):
    """Generic version of :class:`Env` for environments with constant specs."""


class DummyEnv(GenericEnv):
    """The simplest environment possible, for testing and debugging.

    The state is a position along a 1D axis; the action perturbs it; the
    reward is the negative distance from the origin
    (``/root/reference/src/rl8/env.py:164-203``).
    """

    #: Default state-magnitude bound for initial-state sampling.
    default_bounds: float = 100.0

    def __init__(self, num_envs: int, /, horizon: None | int = None) -> None:
        super().__init__(num_envs, horizon)
        self.observation_spec = Unbounded(1)

    def reset(
        self,
        key: jax.Array,
        *,
        state: EnvState = None,
        config: EnvConfig = None,
    ) -> tuple[EnvState, jax.Array]:
        config = config or {}
        if "bounds" in config:
            bounds = jnp.asarray(config["bounds"], dtype=jnp.float32)
        elif state is not None:
            bounds = state["bounds"]
        else:
            bounds = jnp.asarray(self.default_bounds, dtype=jnp.float32)
        pos = jax.random.uniform(
            key, (self.num_envs, 1), dtype=jnp.float32, minval=-1.0, maxval=1.0
        ) * bounds
        new_state = {"position": pos, "bounds": bounds}
        return new_state, pos


class ContinuousDummyEnv(DummyEnv):
    """Continuous dummy env: the action moves the state by any magnitude
    (``/root/reference/src/rl8/env.py:206-230``)."""

    def __init__(self, num_envs: int, /, horizon: None | int = None) -> None:
        super().__init__(num_envs, horizon)
        self.action_spec = Unbounded(1)

    def step(self, state: EnvState, action: jax.Array) -> tuple[EnvState, jax.Array, jax.Array]:
        pos = state["position"] + action
        new_state = {"position": pos, "bounds": state["bounds"]}
        return new_state, pos, -jnp.abs(pos)


class DiscreteDummyEnv(DummyEnv):
    """Discrete dummy env: the action moves the state left/right one unit
    (``/root/reference/src/rl8/env.py:233-259``).

    Examples:
        >>> import jax
        >>> import jax.numpy as jnp
        >>> from rl8_tpu.env import DiscreteDummyEnv
        >>> env = DiscreteDummyEnv(2)
        >>> state, obs = env.reset(jax.random.key(0))
        >>> obs.shape
        (2, 1)
        >>> state, obs, rewards = env.step(state, jnp.ones((2, 1), jnp.int32))
        >>> rewards.shape  # reward = -|position|
        (2, 1)

    """

    def __init__(self, num_envs: int, /, horizon: None | int = None) -> None:
        super().__init__(num_envs, horizon)
        self.action_spec = Discrete(2, shape=(1,))

    def step(self, state: EnvState, action: jax.Array) -> tuple[EnvState, jax.Array, jax.Array]:
        pos = state["position"] + (2 * action - 1).astype(jnp.float32)
        new_state = {"position": pos, "bounds": state["bounds"]}
        return new_state, pos, -jnp.abs(pos)

