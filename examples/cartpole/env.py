"""CartPole: infinite-horizon variant with continuous shaped reward.

JAX counterpart of ``/root/reference/examples/cartpole/env.py``. The
reference compiles its batched step with ``@torch.compile``
(``env.py:12``); here the step is pure ``jnp`` math that the algorithm's
jitted collect scan fuses into one XLA program — the TPU-native analog
(no per-step kernel launches at all).

Physics config values live in the env-state pytree as (traceable)
scalars, so per-reset domain randomization works inside jit.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from rl8_tpu.env import Env, EnvConfig, EnvState
from rl8_tpu.specs import Discrete, Unbounded

__all__ = ["CartPole", "CartPoleConfig"]


@dataclass
class CartPoleConfig:
    """Physics parameters (``/root/reference/examples/cartpole/env.py:69-97``)."""

    cart_mass: float = 1.0
    force_mag: float = 5.0
    gravity: float = 9.8
    #: ``"euler"`` (explicit) or anything else for semi-implicit Euler
    #: (``/root/reference/examples/cartpole/env.py:42-51``).
    kinematics_integrator: str = "euler"
    length: float = 0.5
    pole_mass: float = 0.1
    tau: float = 0.02
    #: Pole mass * pole length. Derived — not settable; passing it via an
    #: env config raises instead of being silently recomputed.
    pole_mass_length: float = field(init=False)
    #: Pole mass + cart mass. Derived — not settable.
    total_mass: float = field(init=False)

    def __post_init__(self) -> None:
        self.pole_mass_length = self.pole_mass * self.length
        self.total_mass = self.cart_mass + self.pole_mass


def _step_physics(
    phys: jax.Array, action: jax.Array, cfg: dict[str, Any]
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched cart-pole dynamics: ``phys [B, 4]`` = (x, x_dot, theta,
    theta_dot); Euler integration and the shaped infinite-horizon reward
    (``/root/reference/examples/cartpole/env.py:12-64``)."""
    x, x_dot, theta, theta_dot = phys[:, 0], phys[:, 1], phys[:, 2], phys[:, 3]
    pole_mass_length = cfg["pole_mass_length"]
    total_mass = cfg["total_mass"]

    force = (action.reshape(-1).astype(jnp.float32) - 1) * cfg["force_mag"]
    costheta = jnp.cos(theta)
    sintheta = jnp.sin(theta)

    tmp = (force + pole_mass_length * theta_dot**2 * sintheta) / total_mass
    theta_acc = (cfg["gravity"] * sintheta - costheta * tmp) / (
        cfg["length"] * (4.0 / 3.0 - cfg["pole_mass"] * costheta**2 / total_mass)
    )
    x_acc = tmp - pole_mass_length * theta_acc * costheta / total_mass

    tau = cfg["tau"]
    # Both integrators (``env.py:42-51``), selected by the traced
    # ``semi_implicit`` flag so per-reset config switches stay jittable.
    x_dot_new = x_dot + tau * x_acc
    theta_dot_new = theta_dot + tau * theta_acc
    si = cfg["semi_implicit"] > 0
    x = jnp.where(si, x + tau * x_dot_new, x + tau * x_dot)
    theta = jnp.where(si, theta + tau * theta_dot_new, theta + tau * theta_dot)
    x_dot = x_dot_new
    theta_dot = theta_dot_new

    phys = jnp.stack((x, x_dot, theta, theta_dot), axis=1)
    obs = jnp.stack(
        (x, x_dot, jnp.cos(theta), jnp.sin(theta), theta_dot), axis=1
    )
    # Shaped reward: distance of (cos, sin) from upright plus magnitudes
    # of x, x_dot, theta_dot.
    theta_error = jnp.abs(obs[:, 2] - 1.0) + jnp.abs(obs[:, 3])
    other_errors = jnp.abs(x) + jnp.abs(x_dot) + jnp.abs(theta_dot)
    reward = -(theta_error + other_errors)[:, None]
    return phys, obs, reward


class CartPole(Env):
    """Reimplementation of the classic CartPole environment
    (``/root/reference/examples/cartpole/env.py:101-150``)."""

    max_horizon = 128

    def __init__(self, num_envs: int, /, horizon: None | int = None) -> None:
        super().__init__(num_envs, horizon)
        self.observation_spec = Unbounded(5)
        self.action_spec = Discrete(3, shape=(1,))

    def reset(
        self,
        key: jax.Array,
        *,
        state: EnvState = None,
        config: EnvConfig = None,
    ) -> tuple[EnvState, jax.Array]:
        cfg_vals = asdict(CartPoleConfig(**(config or {})))
        integrator = cfg_vals.pop("kinematics_integrator")
        cfg = {
            k: jnp.asarray(v, dtype=jnp.float32) for k, v in cfg_vals.items()
        }
        # Strings can't live in the traced env-state pytree; encode the
        # integrator choice as a 0/1 flag selected inside the step.
        cfg["semi_implicit"] = jnp.asarray(
            0.0 if integrator == "euler" else 1.0, dtype=jnp.float32
        )
        phys = 0.01 * jax.random.normal(key, (self.num_envs, 4), dtype=jnp.float32)
        x, x_dot, theta, theta_dot = (
            phys[:, 0],
            phys[:, 1],
            phys[:, 2],
            phys[:, 3],
        )
        obs = jnp.stack(
            (x, x_dot, jnp.cos(theta), jnp.sin(theta), theta_dot), axis=1
        )
        return {"phys": phys, "cfg": cfg}, obs

    def step(self, state: EnvState, action: jax.Array) -> tuple[EnvState, jax.Array, jax.Array]:
        phys, obs, reward = _step_physics(state["phys"], action, state["cfg"])
        return {"phys": phys, "cfg": state["cfg"]}, obs, reward
