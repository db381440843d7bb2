"""Pendulum: classic continuous-control swing-up.

JAX counterpart of ``/root/reference/examples/pendulum/env.py``; the
``@torch.compile`` step (``env.py:12``) becomes pure ``jnp`` math fused
into the jitted collect scan.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass
from typing import Any

import jax
import jax.numpy as jnp

from rl8_tpu.env import Env, EnvConfig, EnvState
from rl8_tpu.specs import Unbounded

__all__ = ["Pendulum", "PendulumConfig"]


@dataclass
class PendulumConfig:
    """Physics parameters (``/root/reference/examples/pendulum/env.py:42-60``)."""

    dt: float = 0.05
    g: float = 10.0
    l: float = 1.0
    m: float = 1.0
    max_speed: float = 8.0
    max_torque: float = 2.0


def _step_physics(
    phys: jax.Array, action: jax.Array, cfg: dict[str, Any]
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """``phys [B, 2]`` = (theta, theta_dot); torque-limited dynamics and
    the negative quadratic cost
    (``/root/reference/examples/pendulum/env.py:12-39``)."""
    th, thdot = phys[:, 0], phys[:, 1]
    u = jnp.clip(action.reshape(-1), -cfg["max_torque"], cfg["max_torque"])
    costs = (
        (((th + jnp.pi) % (2 * jnp.pi)) - jnp.pi) ** 2
        + 0.1 * thdot**2
        + 0.001 * u**2
    )
    newthdot = thdot + (
        3 * cfg["g"] / (2 * cfg["l"]) * jnp.sin(th)
        + 3.0 / (cfg["m"] * cfg["l"] ** 2) * u
    ) * cfg["dt"]
    newthdot = jnp.clip(newthdot, -cfg["max_speed"], cfg["max_speed"])
    newth = th + newthdot * cfg["dt"]
    phys = jnp.stack((newth, newthdot), axis=1)
    obs = jnp.stack((jnp.cos(newth), jnp.sin(newth), newthdot), axis=1)
    return phys, obs, -costs[:, None]


class Pendulum(Env):
    """Reimplementation of the classic Pendulum environment
    (``/root/reference/examples/pendulum/env.py:63-118``)."""

    max_horizon = 512

    def __init__(self, num_envs: int, /, horizon: None | int = None) -> None:
        super().__init__(num_envs, horizon)
        self.action_spec = Unbounded(1)
        self.observation_spec = Unbounded(3)

    def reset(
        self,
        key: jax.Array,
        *,
        state: EnvState = None,
        config: EnvConfig = None,
    ) -> tuple[EnvState, jax.Array]:
        cfg = {
            k: jnp.asarray(v, dtype=jnp.float32)
            for k, v in asdict(PendulumConfig(**(config or {}))).items()
        }
        k1, k2 = jax.random.split(key)
        th = jax.random.uniform(
            k1, (self.num_envs,), minval=-jnp.pi, maxval=jnp.pi
        )
        thdot = jax.random.uniform(k2, (self.num_envs,), minval=-1.0, maxval=1.0)
        phys = jnp.stack((th, thdot), axis=1)
        obs = jnp.stack((jnp.cos(th), jnp.sin(th), thdot), axis=1)
        return {"phys": phys, "cfg": cfg}, obs

    def step(self, state: EnvState, action: jax.Array) -> tuple[EnvState, jax.Array, jax.Array]:
        phys, obs, reward = _step_physics(state["phys"], action, state["cfg"])
        return {"phys": phys, "cfg": state["cfg"]}, obs, reward
