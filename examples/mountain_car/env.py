"""MountainCar: classic underpowered-car hill climb with reward shaping.

JAX counterpart of ``/root/reference/examples/mountain_car/env.py``.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass
from typing import Any

import jax
import jax.numpy as jnp

from rl8_tpu.env import Env, EnvConfig, EnvState
from rl8_tpu.specs import Discrete, Unbounded

__all__ = ["MountainCar", "MountainCarConfig"]


@dataclass
class MountainCarConfig:
    """Physics parameters
    (``/root/reference/examples/mountain_car/env.py:41-62``)."""

    force_mag: float = 0.001
    goal_position: float = 0.5
    goal_velocity: float = 0.0
    gravity: float = 0.0025
    max_position: float = 0.6
    max_speed: float = 0.07
    min_position: float = -1.2


def _step_physics(
    phys: jax.Array, action: jax.Array, cfg: dict[str, Any]
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """``phys [B, 2]`` = (position, velocity); clip-based dynamics with
    shaped distance reward and a goal bonus
    (``/root/reference/examples/mountain_car/env.py:12-38``)."""
    position, velocity = phys[:, 0], phys[:, 1]
    velocity = velocity + (
        action.reshape(-1).astype(jnp.float32) - 1
    ) * cfg["force_mag"] - cfg["gravity"] * jnp.cos(3 * position)
    velocity = jnp.clip(velocity, -cfg["max_speed"], cfg["max_speed"])
    position = jnp.clip(position + velocity, cfg["min_position"], cfg["max_position"])
    velocity = jnp.where(
        (position == cfg["min_position"]) & (velocity < 0), 0.0, velocity
    )
    reward = -jnp.abs(position - cfg["goal_position"])
    reward = jnp.where(
        (position >= cfg["goal_position"]) & (velocity >= cfg["goal_velocity"]),
        1.0,
        reward,
    )
    phys = jnp.stack((position, velocity), axis=1)
    return phys, phys, reward[:, None]


class MountainCar(Env):
    """Reimplementation of the classic MountainCar environment
    (``/root/reference/examples/mountain_car/env.py:65-116``)."""

    max_horizon = 512

    def __init__(self, num_envs: int, /, horizon: None | int = None) -> None:
        super().__init__(num_envs, horizon)
        self.observation_spec = Unbounded(2)
        self.action_spec = Discrete(3, shape=(1,))

    def reset(
        self,
        key: jax.Array,
        *,
        state: EnvState = None,
        config: EnvConfig = None,
    ) -> tuple[EnvState, jax.Array]:
        cfg = {
            k: jnp.asarray(v, dtype=jnp.float32)
            for k, v in asdict(MountainCarConfig(**(config or {}))).items()
        }
        k1, k2 = jax.random.split(key)
        position = -0.5 + 0.05 * jax.random.normal(k1, (self.num_envs,))
        velocity = 0.05 * jax.random.normal(k2, (self.num_envs,))
        phys = jnp.stack((position, velocity), axis=1)
        return {"phys": phys, "cfg": cfg}, phys

    def step(self, state: EnvState, action: jax.Array) -> tuple[EnvState, jax.Array, jax.Array]:
        phys, obs, reward = _step_physics(state["phys"], action, state["cfg"])
        return {"phys": phys, "cfg": state["cfg"]}, obs, reward
