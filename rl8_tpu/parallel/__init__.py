"""Multi-chip sharding: the TPU-new component.

The reference is single-process/single-device by design
(``/root/reference/src/rl8/algorithms/__init__.py:8-14``,
``README.md:196-210``). This module adds the TPU-native scale-out path:
a 1-D device mesh whose ``"env"`` axis shards the environment batch —
env state, observation windows, and the rollout buffer all shard along
``num_envs``, while model params and optimizer state stay replicated.
Because the whole train loop is jitted pure functions over the state
pytree, sharding is purely a matter of *input placement*: GSPMD
propagates the shardings through collect/step and inserts the gradient
all-reduce (over ICI) where the replicated-param gradient meets the
sharded batch. Multi-host runs only additionally need
``jax.distributed.initialize()``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "create_mesh",
    "initialize_multihost",
    "shard_state",
    "shard_batch",
    "state_pspecs",
    "gmean",
    "gstd",
    "gmin",
    "gmax",
    "pmean_tree",
    "ENV_AXIS",
]


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize JAX's multi-host runtime for pod-slice training.

    Call once per host before constructing algorithms. On TPU pods the
    arguments are inferred from the environment; pass them explicitly
    elsewhere. After initialization, ``create_mesh()`` spans all hosts'
    devices, env instances and the rollout buffer shard across hosts,
    and gradient all-reduce rides ICI within a slice (DCN across
    slices) — this is the multi-host scale-out path promised in
    SURVEY.md section 2.3.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )

#: Name of the mesh axis the environment batch shards over.
ENV_AXIS = "env"


def create_mesh(
    devices: Any = None, *, axis_name: str = ENV_AXIS
) -> Mesh:
    """Create a 1-D mesh over ``devices`` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))


def _shard_leaf(
    leaf: jax.Array, mesh: Mesh, num_envs: int, axis_name: str
) -> jax.Array:
    """Place an env-batched leaf per :func:`_batch_leaf_spec`."""
    spec = _batch_leaf_spec(leaf, num_envs, axis_name)
    return jax.device_put(leaf, NamedSharding(mesh, spec))


def shard_batch(batch: Any, mesh: Mesh, num_envs: int, *, axis_name: str = ENV_AXIS) -> Any:
    """Shard a pytree of batched arrays along the env axis."""
    return jax.tree_util.tree_map(
        lambda x: _shard_leaf(x, mesh, num_envs, axis_name), batch
    )


def shard_state(state: Any, mesh: Mesh, num_envs: int, *, axis_name: str = ENV_AXIS) -> Any:
    """Shard an :class:`rl8_tpu.data.AlgorithmState`: env-batched leaves
    along the ``env`` axis, params/optimizer state replicated."""
    replicated = NamedSharding(mesh, PartitionSpec())
    return state.replace(
        params=jax.device_put(state.params, replicated),
        opt_state=jax.device_put(state.opt_state, replicated),
        env_state=shard_batch(state.env_state, mesh, num_envs, axis_name=axis_name),
        buffer=shard_batch(state.buffer, mesh, num_envs, axis_name=axis_name),
        rng=jax.device_put(state.rng, replicated),
        horizons=jax.device_put(state.horizons, replicated),
        buffered=jax.device_put(state.buffered, replicated),
        reward_scale=jax.device_put(state.reward_scale, replicated),
    )


# ----------------------------------------------------------------------
# Axis-aware global reductions (shard_map path)
# ----------------------------------------------------------------------
#
# Inside ``shard_map`` each device sees only its env shard, so batch
# statistics that the reference computes globally (advantage
# normalization ``nn/functional.py:118-122``, reward scale
# ``algorithms/_feedforward.py:428-436``, return stats) must reduce over
# the mesh axis to preserve semantics (SURVEY.md section 7 "multi-host
# determinism"). With ``axis_name=None`` these are plain local
# reductions, so single-device and sharded code share one implementation.


def gmean(x: Any, axis_name: str | None = None) -> jax.Array:
    """Mean over all elements, globally across the mesh axis (shards are
    equal-sized, so the mean of local means is exact)."""
    m = jnp.mean(x)
    return jax.lax.pmean(m, axis_name) if axis_name else m


def gstd(x: Any, axis_name: str | None = None) -> jax.Array:
    """Population standard deviation over all elements, globally.

    Two-pass (centered) like ``jnp.std`` — the one-pass E[x^2] - E[x]^2
    form catastrophically cancels in f32 when ``|mean| >> std``."""
    if axis_name is None:
        return jnp.std(x)
    m = jax.lax.pmean(jnp.mean(x), axis_name)
    var = jax.lax.pmean(jnp.mean(jnp.square(x - m)), axis_name)
    return jnp.sqrt(var)


def gmin(x: Any, axis_name: str | None = None) -> jax.Array:
    m = jnp.min(x)
    return jax.lax.pmin(m, axis_name) if axis_name else m


def gmax(x: Any, axis_name: str | None = None) -> jax.Array:
    m = jnp.max(x)
    return jax.lax.pmax(m, axis_name) if axis_name else m


def pmean_tree(tree: Any, axis_name: str | None = None) -> Any:
    """``lax.pmean`` every leaf (identity when unsharded)."""
    if axis_name is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, axis_name), tree
    )


#: Algorithm-state fields holding env-batched data; every other field
#: (params, optimizer state, RNG, counters, reward scale) is replicated.
_BATCHED_STATE_FIELDS = ("env_state", "buffer")


def _batch_leaf_spec(leaf: Any, num_envs: int, axis_name: str) -> PartitionSpec:
    """Spec for a leaf of an env-batched subtree: shard the axis sized
    ``num_envs`` (axis 0 for env state ``[B, ...]``, axis 1 for
    time-major buffers ``[T, B, ...]``); replicate per-config scalars."""
    shape = jnp.shape(leaf)
    if len(shape) >= 1 and shape[0] == num_envs:
        return PartitionSpec(axis_name)
    if len(shape) >= 2 and shape[1] == num_envs:
        return PartitionSpec(None, axis_name)
    return PartitionSpec()


def state_pspecs(state: Any, num_envs: int, *, axis_name: str = ENV_AXIS) -> Any:
    """PartitionSpec pytree matching :func:`shard_state`'s placement.

    Classification is FIELD-based (only ``env_state``/``buffer`` subtrees
    are env-batched), not shape-based, so parameter/optimizer leaves
    whose dimensions coincidentally equal ``num_envs`` (e.g. a 256-wide
    hidden layer with ``num_envs=256``) stay replicated."""
    spec_of = {
        name: jax.tree_util.tree_map(
            lambda leaf: _batch_leaf_spec(leaf, num_envs, axis_name),
            getattr(state, name),
        )
        for name in _BATCHED_STATE_FIELDS
    }
    replicated = jax.tree_util.tree_map(lambda _: PartitionSpec(), state)
    return replicated.replace(**spec_of)
