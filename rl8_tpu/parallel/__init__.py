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
    "is_main_process",
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
    *,
    cpu_collectives: str | None = None,
) -> None:
    """Initialize JAX's multi-host runtime for pod-slice training.

    Call once per host before constructing algorithms. On TPU pods the
    arguments are inferred from the environment; pass them explicitly
    elsewhere. After initialization, ``create_mesh()`` spans all hosts'
    devices, env instances and the rollout buffer shard across hosts,
    and gradient all-reduce rides ICI within a slice (DCN across
    slices) — this is the multi-host scale-out path promised in
    SURVEY.md section 2.3. Trainers log metrics and the checkpoint
    host-state file from process 0 only (single-writer semantics,
    matching the reference's single process:
    ``/root/reference/src/rl8/trainers/_base.py:200``); orbax array
    saves remain collective across processes.

    Args:
        coordinator_address: ``host:port`` of process 0's coordination
            service (inferred on TPU pods).
        num_processes: Total process count (inferred on TPU pods).
        process_id: This process's index (inferred on TPU pods).
        cpu_collectives: Cross-process collective implementation for the
            CPU backend (``"gloo"`` or ``"mpi"``); required for
            multi-process runs on CPU (e.g. the 2-process CI test),
            ignored on TPU.
    """
    import jax

    if cpu_collectives is not None:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_main_process() -> bool:
    """Whether this is process 0 — the single metrics/host-state writer
    in a multi-host run (every process in a single-process run)."""
    return jax.process_index() == 0

#: Name of the mesh axis the environment batch shards over.
ENV_AXIS = "env"


def create_mesh(
    devices: Any = None, *, axis_name: str = ENV_AXIS
) -> Mesh:
    """Create a 1-D mesh over ``devices`` (default: all devices, every
    host), ordered so collectives ride the fastest links.

    Single slice: ``jax.experimental.mesh_utils.create_device_mesh``
    orders the devices along the slice's ICI torus (a ring-friendly
    order for the gradient all-reduce). Multi-slice (devices spanning
    2+ ``slice_index`` values, i.e. DCN-connected slices):
    ``create_hybrid_device_mesh`` lays the axis out ICI-inner/DCN-outer
    — each slice's devices contiguous along the axis — so XLA
    decomposes the all-reduce hierarchically (reduce-scatter within a
    slice over ICI, the small cross-slice hop over DCN, all-gather back
    over ICI) instead of threading a single ring through arbitrary
    ICI/DCN interleavings. SURVEY §2.3: "DCN only for multi-slice
    scale-out"; see ``docs/performance.md`` for the multi-slice story.
    """
    import numpy as np

    return Mesh(np.asarray(_order_devices(devices)), (axis_name,))


def _order_devices(devices: Any = None) -> list:
    """The mesh-axis device ordering :func:`create_mesh` uses (split out
    so tests can drive the multi-slice layout with stand-in device
    objects and map the ordering back onto real devices)."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if len(devices) > 1:
        from jax.experimental import mesh_utils

        slice_ids = {getattr(d, "slice_index", None) for d in devices}
        multi_slice = len(slice_ids) > 1 and None not in slice_ids
        try:
            if multi_slice and len(devices) % len(slice_ids) == 0:
                arr = mesh_utils.create_hybrid_device_mesh(
                    (len(devices) // len(slice_ids),),
                    (len(slice_ids),),
                    devices=devices,
                )
            else:
                arr = mesh_utils.create_device_mesh(
                    (len(devices),), devices=devices
                )
            return list(arr.reshape(-1))
        except (ValueError, AssertionError, NotImplementedError) as e:
            # Unusual topologies (e.g. a hand-picked device subset) fall
            # back to the given order. Within one slice that's benign
            # (all-to-all ICI); across slices it threads the all-reduce
            # ring through DCN hops arbitrarily — the exact pathology
            # the hybrid layout exists to avoid — so say so loudly.
            if multi_slice:
                import warnings

                warnings.warn(
                    "create_mesh could not build a slice-aware device"
                    f" order ({type(e).__name__}: {e}); falling back to"
                    " the given order. Cross-slice collectives may"
                    " interleave ICI and DCN hops suboptimally.",
                    RuntimeWarning,
                    stacklevel=2,
                )
    return devices


def _global_put(leaf: Any, sharding: NamedSharding) -> jax.Array:
    """Place ``leaf`` with ``sharding``, supporting meshes that span
    multiple processes.

    Single-process meshes use a plain ``device_put``. When the mesh
    includes non-addressable devices (multi-host), every process holds
    the same full host value (state construction is deterministic given
    the seed), so each process serves its addressable shards through
    ``jax.make_array_from_callback``. Typed PRNG keys are unwrapped to
    their raw key data for placement and re-wrapped after.
    """
    if sharding.is_fully_addressable:
        return jax.device_put(leaf, sharding)
    import numpy as np

    if jnp.issubdtype(jnp.asarray(leaf).dtype, jax.dtypes.prng_key):
        impl = jax.random.key_impl(leaf)  # preserve non-default PRNGs
        data = np.asarray(jax.random.key_data(leaf))
        arr = jax.make_array_from_callback(
            data.shape, sharding, lambda idx: data[idx]
        )
        return jax.random.wrap_key_data(arr, impl=impl)
    host = np.asarray(leaf)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )


def _shard_leaf(
    leaf: jax.Array,
    mesh: Mesh,
    num_envs: int,
    axis_name: str,
    time_major: bool = False,
) -> jax.Array:
    """Place an env-batched leaf per :func:`_batch_leaf_spec`."""
    spec = _batch_leaf_spec(leaf, num_envs, axis_name, time_major)
    return _global_put(leaf, NamedSharding(mesh, spec))


def shard_batch(
    batch: Any,
    mesh: Mesh,
    num_envs: int,
    *,
    axis_name: str = ENV_AXIS,
    time_major: bool = False,
) -> Any:
    """Shard a pytree of batched arrays along the env axis.

    ``time_major=False`` (env state): leaves are batch-leading
    ``[num_envs, ...]`` or unbatched per-config data. ``time_major=True``
    (rollout buffers): leaves are ``[T, num_envs, ...]``.
    """
    return jax.tree_util.tree_map(
        lambda x: _shard_leaf(x, mesh, num_envs, axis_name, time_major), batch
    )


def shard_state(state: Any, mesh: Mesh, num_envs: int, *, axis_name: str = ENV_AXIS) -> Any:
    """Shard an :class:`rl8_tpu.data.AlgorithmState`: env-batched leaves
    along the ``env`` axis, everything else replicated.

    Field-driven (``dataclasses.fields``) rather than a hand-kept list,
    so state subclasses' extra fields (e.g.
    ``RecurrentAlgorithmState.seqs``) are globally placed too — a field
    silently left process-local would break the first multi-host step.
    """
    import dataclasses

    replicated = NamedSharding(mesh, PartitionSpec())
    placed = {}
    for field in dataclasses.fields(state):
        tree = getattr(state, field.name)
        if field.name in _BATCHED_STATE_FIELDS:
            placed[field.name] = shard_batch(
                tree,
                mesh,
                num_envs,
                axis_name=axis_name,
                time_major=(field.name == "buffer"),
            )
        else:
            placed[field.name] = jax.tree_util.tree_map(
                lambda x: _global_put(x, replicated), tree
            )
    return state.replace(**placed)


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
    """SAMPLE standard deviation (``ddof=1``) over all elements,
    globally across the mesh axis.

    ``ddof=1`` matches ``torch.std``'s unbiased default, which the
    reference uses for its reward scale, advantage normalization, and
    return/reward metrics (``_feedforward.py:413-436``,
    ``nn/functional.py:118-122``); a population std here would shrink
    every one of those by ``sqrt((n-1)/n)``. Two-pass (centered) — the
    one-pass E[x^2] - E[x]^2 form catastrophically cancels in f32 when
    ``|mean| >> std``."""
    if axis_name is None:
        return jnp.std(x, ddof=1)
    m = jax.lax.pmean(jnp.mean(x), axis_name)
    var = jax.lax.pmean(jnp.mean(jnp.square(x - m)), axis_name)
    n = jnp.asarray(
        jnp.size(x) * jax.lax.psum(1, axis_name), jnp.float32
    )
    return jnp.sqrt(var * n / (n - 1.0))


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


def _batch_leaf_spec(
    leaf: Any, num_envs: int, axis_name: str, time_major: bool = False
) -> PartitionSpec:
    """Spec for a leaf of an env-batched subtree.

    The batch axis position is FIXED per subtree — axis 0 for env state
    ``[B, ...]``, axis 1 for time-major buffers ``[T, B, ...]`` — never
    inferred by searching the shape for ``num_envs`` (a positional match
    could silently shard the wrong axis of a leaf like ``[K, num_envs]``
    that isn't batch-at-axis-1). A non-batched leaf (per-config data) is
    replicated; a leaf whose expected batch axis is NOT ``num_envs``-
    sized but that carries ``num_envs`` elsewhere is ambiguous and is
    loudly rejected.
    """
    shape = jnp.shape(leaf)
    batch_axis = 1 if time_major else 0
    if len(shape) > batch_axis and shape[batch_axis] == num_envs:
        spec = [None] * (batch_axis + 1)
        spec[batch_axis] = axis_name
        return PartitionSpec(*spec)
    if num_envs in shape and num_envs > 1:
        where = "axis 1 of time-major [T, B, ...]" if time_major else "axis 0"
        raise ValueError(
            f"Ambiguous env-batched leaf with shape {shape}: the batch"
            f" axis must be {where} to shard over the mesh's"
            f" '{axis_name}' axis, but num_envs={num_envs} appears at a"
            " different position. Move the env-batch axis to the"
            " expected position, or keep genuinely unbatched data whose"
            f" dimensions coincide with num_envs out of the"
            " env-state/buffer pytrees (e.g. close over it in the env)."
        )
    return PartitionSpec()


def state_pspecs(state: Any, num_envs: int, *, axis_name: str = ENV_AXIS) -> Any:
    """PartitionSpec pytree matching :func:`shard_state`'s placement.

    Classification is FIELD-based (only ``env_state``/``buffer`` subtrees
    are env-batched), not shape-based, so parameter/optimizer leaves
    whose dimensions coincidentally equal ``num_envs`` (e.g. a 256-wide
    hidden layer with ``num_envs=256``) stay replicated."""
    spec_of = {
        name: jax.tree_util.tree_map(
            lambda leaf, tm=(name == "buffer"): _batch_leaf_spec(
                leaf, num_envs, axis_name, tm
            ),
            getattr(state, name),
        )
        for name in _BATCHED_STATE_FIELDS
    }
    replicated = jax.tree_util.tree_map(lambda _: PartitionSpec(), state)
    return replicated.replace(**spec_of)
