"""Mid-training checkpoint / resume.

The reference has NO mid-training checkpointing — persistence is a
terminal cloudpickle export only
(``/root/reference/src/rl8/policies/_feedforward.py:178-190``), so a
preempted run loses everything. This module adds TPU-production-grade
checkpointing via orbax: the complete algorithm state (params, optimizer
state, env state, rollout buffer, RNG, counters, reward scale) plus the
host-side trainer/scheduler counters, so a restored run continues
bit-exactly from the last checkpoint.

Crash safety: each save writes a fresh ``ckpt-<K>/`` subdirectory and
only then atomically updates ``latest.json`` to point at it (a plain
file replaced with ``os.replace``). A preemption mid-save — the exact
event checkpointing exists for — leaves ``latest.json`` pointing at the
previous complete checkpoint, so auto-resume never reads a
partially-written state tree. The previous checkpoint is retained (two
generations on disk); older ones are pruned.

Multi-host: the orbax array save/restore is COLLECTIVE — every process
calls it, each writing/reading its addressable shards — while
``latest.json`` and the host-state JSON are written by process 0 only.
The checkpoint directory must therefore live on a filesystem shared by
all hosts (NFS/FUSE-mounted object storage); object-store URL schemes
(``gs://`` etc.) are rejected because the host-side JSON files are
written with plain ``open``.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["save_checkpoint", "restore_checkpoint", "checkpoint_exists"]

_CKPT_RE = re.compile(r"^ckpt-(\d{8})$")
#: Checkpoint generations kept on disk (latest + one fallback).
_KEEP = 2


def _check_local_path(directory: str) -> None:
    if "://" in directory:
        raise ValueError(
            f"Checkpoint directory {directory!r} uses a URL scheme; the"
            " host-side checkpoint files are written with plain file IO,"
            " so the directory must be a filesystem path (use an"
            " NFS/FUSE mount shared by all hosts for multi-host runs)."
        )


def _latest(directory: str) -> tuple[int, str] | None:
    """Return ``(index, subdir)`` of the newest complete checkpoint, or
    ``None``. Reads ``latest.json``; falls back to the pre-versioning
    flat layout (``state/`` + ``host_state.json`` at the top level)."""
    path = os.path.join(directory, "latest.json")
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        sub = os.path.join(directory, data["checkpoint"])
        return int(data["index"]), sub
    if os.path.exists(os.path.join(directory, "host_state.json")) and os.path.isdir(
        os.path.join(directory, "state")
    ):
        return 0, directory  # legacy flat layout
    return None


def checkpoint_exists(directory: str | os.PathLike[str], /) -> bool:
    """Whether ``directory`` holds a complete checkpoint written by
    :func:`save_checkpoint` (``latest.json`` is updated atomically after
    a checkpoint finishes, so it only ever points at complete state)."""
    directory = os.path.abspath(directory)
    latest = _latest(directory)
    if latest is None:
        return False
    _, sub = latest
    return os.path.exists(os.path.join(sub, "host_state.json")) and os.path.isdir(
        os.path.join(sub, "state")
    )


def _encode_rng(state: Any) -> Any:
    """Typed PRNG keys aren't serializable; swap in their raw key data."""
    return state.replace(rng=jax.random.key_data(state.rng))


def _decode_rng(state: Any) -> Any:
    return state.replace(rng=jax.random.wrap_key_data(state.rng))


def _barrier(name: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"rl8_tpu:{name}")


def save_checkpoint(
    directory: str | os.PathLike[str],
    algorithm: Any,
    /,
    *,
    trainer_state: None | dict[str, int] = None,
) -> None:
    """Save an algorithm's full dynamic state (and optional trainer
    counters) as a new checkpoint generation under ``directory``.

    Args:
        directory: Checkpoint directory (created if missing). Holds the
            last two generations plus ``latest.json``.
        algorithm: An ``Algorithm``/``RecurrentAlgorithm`` instance.
        trainer_state: Optional trainer counters to persist alongside.

    """
    import orbax.checkpoint as ocp

    _check_local_path(os.fspath(directory))
    directory = os.path.abspath(directory)
    latest = _latest(directory)
    index = (latest[0] if latest else 0) + 1
    name = f"ckpt-{index:08d}"
    ckpt_dir = os.path.join(directory, name)
    # Clear debris from a previously-interrupted save of this index.
    if jax.process_index() == 0 and os.path.isdir(ckpt_dir):
        shutil.rmtree(ckpt_dir)
    _barrier("checkpoint_begin")

    checkpointer = ocp.PyTreeCheckpointer()
    # COLLECTIVE across processes (each writes its addressable shards).
    checkpointer.save(
        os.path.join(ckpt_dir, "state"),
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
        with open(os.path.join(ckpt_dir, "host_state.json"), "w") as f:
            json.dump(host, f)
        # Publish: atomic replace means latest.json always points at a
        # COMPLETE checkpoint, even across preemptions mid-save.
        tmp = os.path.join(directory, "latest.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"checkpoint": name, "index": index}, f)
        os.replace(tmp, os.path.join(directory, "latest.json"))
        # Prune generations older than the retained window.
        for entry in os.listdir(directory):
            m = _CKPT_RE.match(entry)
            if m and int(m.group(1)) <= index - _KEEP:
                shutil.rmtree(os.path.join(directory, entry), ignore_errors=True)
    # Don't let other processes race ahead (e.g. into an immediate
    # restore) before process 0 publishes the new generation.
    _barrier("checkpoint_publish")


def restore_checkpoint(
    directory: str | os.PathLike[str],
    algorithm: Any,
    /,
) -> dict[str, int]:
    """Restore an algorithm's state from ``directory``'s newest complete
    checkpoint, in place.

    The algorithm must be constructed with the same config (the
    checkpointed pytree must structurally match its state).

    Returns:
        The persisted trainer counters (empty dict if none were saved).

    """
    import orbax.checkpoint as ocp

    _check_local_path(os.fspath(directory))
    directory = os.path.abspath(directory)
    latest = _latest(directory)
    if latest is None:
        raise FileNotFoundError(f"No checkpoint found under {directory}.")
    _, ckpt_dir = latest
    checkpointer = ocp.PyTreeCheckpointer()
    template = _encode_rng(algorithm.state)
    restored = checkpointer.restore(
        os.path.join(ckpt_dir, "state"),
        item=template,
    )
    # Preserve integer/bool dtypes the template declares.
    restored = jax.tree_util.tree_map(
        lambda t, r: jnp.asarray(r, dtype=t.dtype), template, restored
    )
    algorithm.state = _decode_rng(restored)
    with open(os.path.join(ckpt_dir, "host_state.json")) as f:
        host = json.load(f)
    algorithm._horizons_host = host["horizons_host"]
    algorithm.lr_scheduler.coeff = host["lr_coeff"]
    algorithm.entropy_scheduler.coeff = host["entropy_coeff"]
    return host.get("trainer_state", {})
