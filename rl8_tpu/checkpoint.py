"""Mid-training checkpoint / resume.

The reference has NO mid-training checkpointing — persistence is a
terminal cloudpickle export only
(``/root/reference/src/rl8/policies/_feedforward.py:178-190``), so a
preempted run loses everything. This module adds TPU-production-grade
checkpointing via orbax: the complete algorithm state (params, optimizer
state, env state, rollout buffer, RNG, counters, reward scale) plus the
host-side trainer/scheduler counters, so a restored run continues
bit-exactly from the last checkpoint.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["save_checkpoint", "restore_checkpoint", "checkpoint_exists"]


def checkpoint_exists(directory: str | os.PathLike[str], /) -> bool:
    """Whether ``directory`` holds a complete checkpoint written by
    :func:`save_checkpoint` (the host-state file is written last, so its
    presence implies the orbax state tree is complete)."""
    directory = os.path.abspath(directory)
    return os.path.exists(
        os.path.join(directory, "host_state.json")
    ) and os.path.isdir(os.path.join(directory, "state"))


def _encode_rng(state: Any) -> Any:
    """Typed PRNG keys aren't serializable; swap in their raw key data."""
    return state.replace(rng=jax.random.key_data(state.rng))


def _decode_rng(state: Any) -> Any:
    return state.replace(rng=jax.random.wrap_key_data(state.rng))


def save_checkpoint(
    directory: str | os.PathLike[str],
    algorithm: Any,
    /,
    *,
    trainer_state: None | dict[str, int] = None,
) -> None:
    """Save an algorithm's full dynamic state (and optional trainer
    counters) to ``directory``.

    Args:
        directory: Checkpoint directory (created/overwritten).
        algorithm: An ``Algorithm``/``RecurrentAlgorithm`` instance.
        trainer_state: Optional trainer counters to persist alongside.

    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    checkpointer = ocp.PyTreeCheckpointer()
    # The orbax save is COLLECTIVE in multi-host runs — every process
    # must call it (each writes its addressable array shards; orbax
    # coordinates through jax.distributed). Only the host-side JSON is
    # single-writer, gated to process 0.
    checkpointer.save(
        os.path.join(directory, "state"),
        _encode_rng(algorithm.state),
        force=True,
    )
    if jax.process_index() == 0:
        host = {
            "horizons_host": algorithm._horizons_host,
            "lr_coeff": algorithm.lr_scheduler.coeff,
            "entropy_coeff": algorithm.entropy_scheduler.coeff,
            "trainer_state": trainer_state or {},
        }
        with open(os.path.join(directory, "host_state.json"), "w") as f:
            json.dump(host, f)
    if jax.process_count() > 1:
        # Don't let other processes race ahead (e.g. into an immediate
        # restore) before process 0 finishes the host-state write.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("rl8_tpu:checkpoint_host_state")


def restore_checkpoint(
    directory: str | os.PathLike[str],
    algorithm: Any,
    /,
) -> dict[str, int]:
    """Restore an algorithm's state from ``directory`` in place.

    The algorithm must be constructed with the same config (the
    checkpointed pytree must structurally match its state).

    Returns:
        The persisted trainer counters (empty dict if none were saved).

    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    checkpointer = ocp.PyTreeCheckpointer()
    template = _encode_rng(algorithm.state)
    restored = checkpointer.restore(
        os.path.join(directory, "state"),
        item=template,
    )
    # Preserve integer/bool dtypes the template declares.
    restored = jax.tree_util.tree_map(
        lambda t, r: jnp.asarray(r, dtype=t.dtype), template, restored
    )
    algorithm.state = _decode_rng(restored)
    with open(os.path.join(directory, "host_state.json")) as f:
        host = json.load(f)
    algorithm._horizons_host = host["horizons_host"]
    algorithm.lr_scheduler.coeff = host["lr_coeff"]
    algorithm.entropy_scheduler.coeff = host["entropy_coeff"]
    return host.get("trainer_state", {})
