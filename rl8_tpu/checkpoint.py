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
only then atomically publishes ``latest.json`` pointing at it (local
filesystems get a tmp-file + ``os.replace``; object stores get a single
object write, which is atomic per object on GCS/S3). A preemption
mid-save — the exact event checkpointing exists for — leaves
``latest.json`` pointing at the previous complete checkpoint, so
auto-resume never reads a partially-written state tree. The previous
checkpoint is retained (two generations on disk); older ones are pruned.

Async saves (``block=False``) keep the same invariant: the call returns
once the state is snapshotted to host memory (training overlaps the
write), and ``latest.json`` is only published when the background write
completes — by the next save/restore/exists call,
:func:`wait_for_checkpoint`, or interpreter exit, whichever comes first.

Storage: paths may be plain filesystem paths or object-store URLs
(``gs://``, ``s3://``, ``az://``) — host-side JSON goes through
``etils.epath`` and the array tree through orbax/tensorstore, both of
which speak object stores natively. TPU pod deployments should point
``checkpoint_dir`` at a bucket; no shared NFS/FUSE mount is needed.

Multi-host: the orbax array save/restore is COLLECTIVE — every process
calls it, each writing/reading its addressable shards — while
``latest.json`` and the host-state JSON are written by process 0 only.

Topology changes: restore reshards to the RESTORING algorithm's
shardings (per-leaf orbax restore args built from the template state),
so a job preempted on one slice shape can resume on a different device
count or mesh — including single-device debug restores of pod
checkpoints.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import jax.numpy as jnp

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "checkpoint_exists",
    "wait_for_checkpoint",
]

_CKPT_RE = re.compile(r"^ckpt-(\d{8})$")
#: Checkpoint generations kept on disk (latest + one fallback).
_KEEP = 2

#: In-flight async save: ``(checkpointer, directory, name, index)``.
#: ``latest.json`` publication is deferred until the background write
#: completes, so the completeness invariant holds for async saves too.
_PENDING: None | tuple[Any, Any, str, int] = None
_ATEXIT_REGISTERED = False


def _as_path(directory: str | os.PathLike[str]) -> Any:
    """``epath.Path`` for ``directory``; local paths are absolutized so
    relative inputs stay stable across ``chdir``."""
    from etils import epath

    raw = os.fspath(directory)
    if "://" not in raw:
        raw = os.path.abspath(raw)
    return epath.Path(raw)


def _latest(directory: Any) -> tuple[int, Any] | None:
    """Return ``(index, subdir)`` of the newest complete checkpoint, or
    ``None``. Reads ``latest.json``; falls back to the pre-versioning
    flat layout (``state/`` + ``host_state.json`` at the top level)."""
    path = directory / "latest.json"
    if path.exists():
        data = json.loads(path.read_text())
        return int(data["index"]), directory / data["checkpoint"]
    if (directory / "host_state.json").exists() and (directory / "state").is_dir():
        return 0, directory  # legacy flat layout
    return None


def checkpoint_exists(
    directory: str | os.PathLike[str], /, *, agree: bool = False
) -> bool:
    """Whether ``directory`` holds a complete checkpoint written by
    :func:`save_checkpoint` (``latest.json`` is published atomically
    after a checkpoint finishes, so it only ever points at complete
    state).

    In single-process runs a pending async save is finished (and
    published) first. In multi-process runs this is a LOCAL read — safe
    to call from any subset of processes — so an unpublished async save
    doesn't count until a collective call (the next collective
    save/restore, :func:`wait_for_checkpoint`, or interpreter exit)
    publishes it. Pass ``agree=True`` (COLLECTIVE: every process must
    call) to return process 0's answer everywhere — on NFS-style shared
    mounts another host's attribute cache can lag a just-published
    ``latest.json``, and resume decisions must not diverge across hosts.
    """
    if jax.process_count() == 1:
        wait_for_checkpoint()
    directory = _as_path(directory)
    exists = False
    if directory.exists():
        latest = _latest(directory)
        if latest is not None:
            _, sub = latest
            exists = (sub / "host_state.json").exists() and (
                sub / "state"
            ).is_dir()
    if agree:
        exists = bool(_broadcast_index(int(exists)))
    return exists


def _encode_rng(state: Any) -> Any:
    """Typed PRNG keys aren't serializable; swap in their raw key data."""
    return state.replace(rng=jax.random.key_data(state.rng))


def _decode_rng(state: Any) -> Any:
    return state.replace(rng=jax.random.wrap_key_data(state.rng))


def _barrier(name: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"rl8_tpu:{name}")


def _broadcast_index(index: int) -> int:
    """Process 0's generation index, agreed on by every process.

    Every process derives the index by reading ``latest.json``, but on
    NFS-style shared mounts a non-zero process can read a STALE copy
    (close-to-open consistency caches attributes for seconds) and
    derive a different index — the collective orbax save would then
    write shards into divergent ``ckpt-*/`` paths, corrupting both
    generations. Object stores are strongly consistent, but the
    broadcast is a few host bytes, so it runs for every multi-process
    save/restore rather than guessing at mount semantics.
    """
    if jax.process_count() == 1:
        return index
    import numpy as np
    from jax.experimental import multihost_utils

    return int(
        multihost_utils.broadcast_one_to_all(np.asarray(index, np.int32))
    )


def _publish_latest(directory: Any, name: str, index: int) -> None:
    """Atomically point ``latest.json`` at checkpoint ``name``."""
    payload = json.dumps({"checkpoint": name, "index": index})
    raw = str(directory)
    if "://" in raw:
        # Object stores write whole objects atomically; readers see
        # either the previous latest.json or the new one, never a
        # partial write.
        (directory / "latest.json").write_text(payload)
        return
    tmp = os.path.join(raw, "latest.json.tmp")
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, os.path.join(raw, "latest.json"))


def _finalize_publish(directory: Any, name: str, index: int) -> None:
    """Publish generation ``name`` and prune old ones (process 0), then
    hold every process until the publish is visible."""
    if jax.process_index() == 0:
        # Publish: latest.json always points at a COMPLETE checkpoint,
        # even across preemptions mid-save.
        _publish_latest(directory, name, index)
        # Prune generations older than the retained window.
        for entry in directory.iterdir():
            m = _CKPT_RE.match(entry.name)
            if m and int(m.group(1)) <= index - _KEEP:
                try:
                    entry.rmtree()
                except OSError:
                    pass
    # Don't let other processes race ahead (e.g. into an immediate
    # restore) before process 0 publishes the new generation.
    _barrier("checkpoint_publish")


def wait_for_checkpoint() -> None:
    """Block until the in-flight async checkpoint (if any) is fully
    written AND published. A no-op when no async save is pending.

    COLLECTIVE in multi-process runs (every process that started the
    async save must call it).
    """
    global _PENDING
    if _PENDING is None:
        return
    checkpointer, directory, name, index = _PENDING
    _PENDING = None
    try:
        # Blocks until this process's background write commits; orbax's
        # own cross-process barrier inside the async manager means the
        # state tree is globally complete once every process returns
        # from here.
        checkpointer.wait_until_finished()
    except Exception as e:
        # The failure belongs to the async save, not to whichever later
        # call happened to flush it. latest.json was never repointed, so
        # the previous complete generation still restores.
        import contextlib

        with contextlib.suppress(Exception):
            checkpointer.close()
        raise RuntimeError(
            f"Background write of checkpoint {name!r} under {directory}"
            " failed; latest.json still points at the previous complete"
            " generation."
        ) from e
    checkpointer.close()
    _finalize_publish(directory, name, index)


def save_checkpoint(
    directory: str | os.PathLike[str],
    algorithm: Any,
    /,
    *,
    trainer_state: None | dict[str, int] = None,
    block: bool = True,
) -> None:
    """Save an algorithm's full dynamic state (and optional trainer
    counters) as a new checkpoint generation under ``directory``.

    Args:
        directory: Checkpoint directory (created if missing) — a local
            path or an object-store URL (``gs://bucket/run1``). Holds the
            last two generations plus ``latest.json``.
        algorithm: An ``Algorithm``/``RecurrentAlgorithm`` instance.
        trainer_state: Optional trainer counters to persist alongside.
        block: ``False`` returns as soon as the state is snapshotted to
            host memory and writes in the background — training resumes
            immediately while serialization overlaps the next steps.
            ``latest.json`` publication is deferred until the write
            completes (:func:`wait_for_checkpoint`, called implicitly by
            the next save/restore/exists and at interpreter exit), so
            the crash-safety invariant is unchanged: an interrupted
            async save leaves ``latest.json`` at the previous complete
            generation.

    """
    import orbax.checkpoint as ocp

    # One generation in flight at a time: a pending async save is
    # finished (and published) before the next index is computed.
    wait_for_checkpoint()

    directory = _as_path(directory)
    if jax.process_index() == 0:
        directory.mkdir(parents=True, exist_ok=True)
    latest = _latest(directory) if directory.exists() else None
    index = _broadcast_index((latest[0] if latest else 0) + 1)
    name = f"ckpt-{index:08d}"
    ckpt_dir = directory / name
    # Clear debris from a previously-interrupted save of this index.
    if jax.process_index() == 0 and ckpt_dir.is_dir():
        ckpt_dir.rmtree()
    _barrier("checkpoint_begin")

    if jax.process_index() == 0:
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        host = {
            "horizons_host": algorithm._horizons_host,
            "lr_coeff": algorithm.lr_scheduler.coeff,
            "entropy_coeff": algorithm.entropy_scheduler.coeff,
            "trainer_state": trainer_state or {},
        }
        (ckpt_dir / "host_state.json").write_text(json.dumps(host))

    state = _encode_rng(algorithm.state)
    if block:
        checkpointer = ocp.PyTreeCheckpointer()
        # COLLECTIVE across processes (each writes its addressable
        # shards).
        checkpointer.save(ckpt_dir / "state", state, force=True)
        _finalize_publish(directory, name, index)
    else:
        global _PENDING, _ATEXIT_REGISTERED
        checkpointer = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        # Returns once device arrays are snapshotted to host memory;
        # serialization + the commit barrier run on background threads.
        checkpointer.save(ckpt_dir / "state", state, force=True)
        _PENDING = (checkpointer, directory, name, index)
        if not _ATEXIT_REGISTERED:
            import atexit

            # A process exiting with an unpublished generation would
            # lose it; finish and publish on the way out.
            atexit.register(wait_for_checkpoint)
            _ATEXIT_REGISTERED = True


def restore_checkpoint(
    directory: str | os.PathLike[str],
    algorithm: Any,
    /,
) -> dict[str, int]:
    """Restore an algorithm's state from ``directory``'s newest complete
    checkpoint, in place.

    The algorithm must be constructed with the same config (the
    checkpointed pytree must structurally match its state), but NOT
    necessarily the same device topology: every leaf is restored with
    the restoring algorithm's own sharding (orbax reshards on read), so
    a checkpoint saved on an 8-device mesh restores onto 4 devices, one
    device, or a different mesh shape bit-exactly.

    Returns:
        The persisted trainer counters (empty dict if none were saved).

    """
    import orbax.checkpoint as ocp

    wait_for_checkpoint()
    directory = _as_path(directory)
    latest = _latest(directory) if directory.exists() else None
    # Agree on process 0's view of the newest generation BEFORE acting
    # on the local read (stale NFS attribute caches can lag on other
    # hosts; see _broadcast_index) — a stale host raising here while
    # process 0 waits in the broadcast would hang the job. -1 encodes
    # "nothing found", 0 the legacy flat layout, >=1 a versioned
    # generation.
    agreed = _broadcast_index(latest[0] if latest is not None else -1)
    if agreed < 0:
        raise FileNotFoundError(f"No checkpoint found under {directory}.")
    if latest is not None and agreed == latest[0]:
        ckpt_dir = latest[1]
    elif agreed == 0:
        ckpt_dir = directory  # legacy flat layout
    else:
        ckpt_dir = directory / f"ckpt-{agreed:08d}"
    checkpointer = ocp.PyTreeCheckpointer()
    template = _encode_rng(algorithm.state)
    # Per-leaf restore args carry the TEMPLATE's shardings, so orbax
    # reshards saved arrays onto this algorithm's topology instead of
    # assuming the saved one (which would be unsafe across topologies).
    restore_args = ocp.checkpoint_utils.construct_restore_args(template)
    restored = checkpointer.restore(
        ckpt_dir / "state",
        item=template,
        restore_args=restore_args,
    )
    # Preserve integer/bool dtypes the template declares.
    restored = jax.tree_util.tree_map(
        lambda t, r: jnp.asarray(r, dtype=t.dtype), template, restored
    )
    algorithm.state = _decode_rng(restored)
    host = json.loads((ckpt_dir / "host_state.json").read_text())
    algorithm._horizons_host = host["horizons_host"]
    algorithm.lr_scheduler.coeff = host["lr_coeff"]
    algorithm.entropy_scheduler.coeff = host["entropy_coeff"]
    return host.get("trainer_state", {})
