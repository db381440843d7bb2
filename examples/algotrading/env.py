"""An environment that mocks algotrading.

JAX counterpart of ``/root/reference/examples/algotrading/env.py``: an
asset's price follows ``y[k+1] = (1 + km) * (1 + kc * sin(f * t)) * y[k]``
with randomly sampled ``km``/``kc``/``f``/``y[0]``; a policy must learn
to hold, buy, or sell based on the price's change relative to the
previous day and to its buy-in position. Demonstrates composite
observations (action mask, invested flag, two log-change floats) and
masked categorical actions.
"""

from __future__ import annotations

import math
from enum import IntEnum

import jax
import jax.numpy as jnp

from rl8_tpu.env import Env, EnvConfig, EnvState
from rl8_tpu.specs import Composite, Discrete, Unbounded

__all__ = ["Action", "AlgoTrading"]


class Action(IntEnum):
    """Environment actions (``env.py:13-21``)."""

    HOLD = 0
    BUY = 1
    SELL = 2


class AlgoTrading(Env):
    """Mock algotrading environment
    (``/root/reference/examples/algotrading/env.py:23-186``)."""

    max_horizon = 128

    def __init__(self, num_envs: int, /, horizon: None | int = None) -> None:
        super().__init__(num_envs, horizon)
        self.observation_spec = Composite(
            {
                "action_mask": Discrete(2, shape=(3,), dtype=jnp.bool_),
                "invested": Discrete(2, shape=(1,), dtype=jnp.int32),
                "LOG_CHANGE(price)": Unbounded(1),
                "LOG_CHANGE(price, position)": Unbounded(1),
            }
        )
        self.action_spec = Discrete(3, shape=(1,))

    def reset(
        self,
        key: jax.Array,
        *,
        state: EnvState = None,
        config: EnvConfig = None,
    ) -> tuple[EnvState, dict[str, jax.Array]]:
        config = config or {}

        def _bound(name: str, default: float) -> jax.Array:
            if name in config:
                return jnp.asarray(config[name], dtype=jnp.float32)
            if state is not None:
                return state["bounds"][name]
            return jnp.asarray(default, dtype=jnp.float32)

        bounds = {
            "f_bounds": _bound("f_bounds", math.pi),
            "k_cyclic_bounds": _bound("k_cyclic_bounds", 0.05),
            "k_market_bounds": _bound("k_market_bounds", 0.05),
        }
        B = self.num_envs
        kf, kc, km, kt, kp = jax.random.split(key, 5)
        f = jax.random.uniform(kf, (B, 1)) * bounds["f_bounds"]
        k_cyclic = (
            jax.random.uniform(kc, (B, 1), minval=-1.0, maxval=1.0)
            * bounds["k_cyclic_bounds"]
        )
        k_market = (
            jax.random.uniform(km, (B, 1), minval=-1.0, maxval=1.0)
            * bounds["k_market_bounds"]
        )
        t = jax.random.randint(kt, (B, 1), 0, 10).astype(jnp.float32)
        price = jax.random.uniform(kp, (B, 1), minval=100.0, maxval=10_000.0)
        action_mask = jnp.tile(
            jnp.array([True, True, False]), (B, 1)
        )
        new_state = {
            "bounds": bounds,
            "action_mask": action_mask,
            "invested": jnp.zeros((B, 1), dtype=jnp.int32),
            "position": jnp.zeros((B, 1)),
            "f": f,
            "k_cyclic": k_cyclic,
            "k_market": k_market,
            "t": t,
            "price": price,
            "log_change_price": jnp.zeros((B, 1)),
            "log_change_price_position": jnp.zeros((B, 1)),
        }
        return new_state, self._obs(new_state)

    @staticmethod
    def _obs(state: EnvState) -> dict[str, jax.Array]:
        return {
            "action_mask": state["action_mask"],
            "invested": state["invested"],
            "LOG_CHANGE(price)": state["log_change_price"],
            "LOG_CHANGE(price, position)": state["log_change_price_position"],
        }

    def step(
        self, state: EnvState, action: jax.Array
    ) -> tuple[EnvState, dict[str, jax.Array], jax.Array]:
        old_price = state["price"]
        a = action.reshape(-1, 1)
        buy = a == Action.BUY
        sell = a == Action.SELL
        hold = a == Action.HOLD

        invested = jnp.where(buy, 1, jnp.where(sell, 0, state["invested"]))
        # The reference recomputes its invested mask AFTER the buy/sell
        # updates (``env.py:148-151``), so anyone not invested
        # post-transition — including this step's sellers — tracks the
        # current price as their position; buyers lock in this price.
        position = jnp.where((invested == 0) | buy, old_price, state["position"])

        reward = jnp.zeros_like(old_price)
        reward = jnp.where(
            sell, jnp.log(old_price) - jnp.log(state["position"]), reward
        )
        # Hold reward applies to envs invested across the step (holders'
        # invested flag is unchanged by the transition).
        reward = jnp.where(
            (invested == 1) & hold, state["log_change_price"], reward
        )

        new_invested_mask = invested == 1
        action_mask = jnp.concatenate(
            [
                jnp.ones_like(new_invested_mask, dtype=bool),  # HOLD always valid
                ~new_invested_mask,  # BUY valid when not invested
                new_invested_mask,  # SELL valid when invested
            ],
            axis=1,
        )

        t = state["t"] + 1
        price = old_price * (1 + state["k_market"]) * (
            1 + state["k_cyclic"] * jnp.sin(t * state["f"])
        )
        log_change_price = jnp.log(price) - jnp.log(old_price)
        log_change_price_position = jnp.log(price) - jnp.log(position)

        new_state = {
            "bounds": state["bounds"],
            "action_mask": action_mask,
            "invested": invested,
            "position": position,
            "f": state["f"],
            "k_cyclic": state["k_cyclic"],
            "k_market": state["k_market"],
            "t": t,
            "price": price,
            "log_change_price": log_change_price,
            "log_change_price_position": log_change_price_position,
        }
        return new_state, self._obs(new_state), reward
