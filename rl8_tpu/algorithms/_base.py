"""Base algorithm definitions.

Counterpart of ``/root/reference/src/rl8/algorithms/_base.py``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import asdict
from typing import Any, Generic, TypeVar

from ..data import AlgorithmHparams, CollectStats, StepStats
from ..env import Env
from ..utils import memory_stats

__all__ = ["GenericAlgorithmBase"]

_Hparams = TypeVar("_Hparams", bound=AlgorithmHparams)
_State = TypeVar("_State")
_Policy = TypeVar("_Policy")


class GenericAlgorithmBase(ABC, Generic[_Hparams, _State, _Policy]):
    """Generic algorithm ABC tying hparam/state/policy type params
    (``/root/reference/src/rl8/algorithms/_base.py:27-158``)."""

    #: Environment being simulated (one object = ``num_envs`` instances).
    env: Env

    #: Frozen, validated hyperparameters (static w.r.t. jit).
    hparams: _Hparams

    #: Policy (model + action distribution); parameters live in ``state``.
    policy: _Policy

    #: Dynamic train state pytree threaded through the jitted programs.
    state: _State

    @property
    def horizons_per_env_reset(self) -> int:
        """Convenience passthrough used by trainers."""
        return self.hparams.horizons_per_env_reset

    @property
    def params(self) -> dict[str, Any]:
        """Flat dict of algorithm parameters for experiment tracking
        (``algorithms/_base.py:99-132``)."""
        out: dict[str, Any] = {
            "env_cls": self.env.__class__.__name__,
            "model_cls": self.policy.model.__class__.__name__,  # type: ignore[attr-defined]
            "distribution_cls": self.policy.distribution_cls.__name__,  # type: ignore[attr-defined]
        }
        out.update(asdict(self.hparams))
        return {k: (v if v is not None else "None") for k, v in out.items()}

    def memory_stats(self) -> dict[str, Any]:
        """Return memory stats for the training backend."""
        return memory_stats()

    # ------------------------------------------------------------------
    # Sharded-execution plumbing (shared by all algorithms)
    # ------------------------------------------------------------------

    def _init_sharding(
        self,
        env_cls: Any,
        mesh: Any,
        exact_sharding: bool,
        num_envs: int,
        horizon: int,
        sgd_minibatch_size: int,
    ) -> None:
        """Place ``self.state`` on the mesh and configure the execution
        mode: ``shard_map`` (default; per-shard impls over a local-sized
        env, explicit collectives) or GSPMD (``exact_sharding=True``;
        global impls, auto-partitioned)."""
        self.mesh = mesh
        #: Mesh axis the impls reduce over (``None`` = single device or
        #: GSPMD exact mode, where reductions are already global).
        self._axis: None | str = None
        #: Env instance and env-batch size AS SEEN BY THE JITTED IMPLS.
        self._impl_env = self.env
        self._impl_B = num_envs
        #: Lazily-built jitted entry points keyed by static arguments.
        self._fn_cache: dict[Any, Any] = {}
        if mesh is None:
            return
        from ..parallel import ENV_AXIS, shard_state

        self.state = shard_state(self.state, mesh, num_envs)
        if exact_sharding:
            return
        n_shards = mesh.size
        if num_envs % n_shards:
            raise ValueError(
                f"`num_envs` ({num_envs}) must divide evenly over the"
                f" mesh's {n_shards} devices."
            )
        if sgd_minibatch_size % n_shards:
            raise ValueError(
                f"`sgd_minibatch_size` ({sgd_minibatch_size}) must divide"
                f" evenly over the mesh's {n_shards} devices."
            )
        self._axis = ENV_AXIS
        self._impl_B = num_envs // n_shards
        self._impl_env = env_cls(self._impl_B, horizon)

    def _wrap_fn(self, impl: Any, operand_tpls: tuple[Any, ...]) -> Any:
        """Jit ``impl`` (donating the state), wrapping it in ``shard_map``
        over the mesh when sharded: the state pytree shards per
        :func:`rl8_tpu.parallel.state_pspecs`, all other operands and all
        stat outputs are replicated."""
        import jax

        if self._axis is None:
            return jax.jit(impl, donate_argnums=(0,))
        from jax.sharding import PartitionSpec as P

        from ..parallel import state_pspecs

        state_specs = state_pspecs(self.state, self.hparams.num_envs)  # type: ignore[attr-defined]
        rep = lambda tpl: jax.tree_util.tree_map(lambda _: P(), tpl)
        fn = jax.shard_map(
            impl,
            mesh=self.mesh,
            in_specs=(state_specs, *(rep(t) for t in operand_tpls)),
            out_specs=(state_specs, P()),
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(0,))

    def _get_fn(self, key: Any, build: Any) -> Any:
        if key not in self._fn_cache:
            self._fn_cache[key] = build()
        return self._fn_cache[key]

    @abstractmethod
    def collect(
        self, *, env_config: None | dict[str, Any] = None, deterministic: bool = False
    ) -> CollectStats:
        ...

    @abstractmethod
    def step(self) -> StepStats:
        ...

    @abstractmethod
    def validate(self) -> None:
        ...
