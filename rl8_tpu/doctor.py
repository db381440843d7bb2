"""Production bring-up checks: ``rl8-tpu doctor``.

The reference has no equivalent — it targets one local GPU, where
"does it run" is the whole question. A TPU pod deployment has more
moving parts (this process's slice of the device mesh, multi-host
initialization, object-store checkpoint access, per-model fused-kernel
gates), and the production guide (``docs/production.md``) walks through
verifying each by hand; ``doctor`` automates that walk into one
command suitable for a pod's startup probe::

    rl8-tpu doctor                          # platform + topology
    rl8-tpu doctor --checkpoint-dir gs://…  # + storage round trip
    rl8-tpu doctor -f train.yaml            # + config/model/gate report

Every check prints one ``ok:``/``fail:`` line; the process exits
non-zero if any check fails, so ``doctor && rl8-tpu train …`` gates a
pod startup script.
"""

from __future__ import annotations

import uuid
from typing import Any

__all__ = ["run_doctor"]


def _check_devices(report: list[tuple[bool, str]]) -> None:
    import jax

    try:
        devices = jax.devices()
    except RuntimeError as e:
        report.append((False, f"backend initialization failed: {e}"))
        return
    kinds = sorted({getattr(d, "device_kind", d.platform) for d in devices})
    report.append(
        (
            True,
            f"{len(devices)} device(s) [{', '.join(kinds)}] on platform"
            f" {devices[0].platform!r}; process"
            f" {jax.process_index()}/{jax.process_count()},"
            f" {len(jax.local_devices())} local",
        )
    )
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if slice_ids != {None}:
        report.append(
            (
                True,
                f"{len(slice_ids)} slice(s); create_mesh orders"
                + (
                    " ICI-inner/DCN-outer (hybrid)"
                    if len(slice_ids) > 1
                    else " along the slice's ICI torus"
                ),
            )
        )


def _check_mesh(report: list[tuple[bool, str]]) -> None:
    import jax

    from .parallel import create_mesh

    try:
        mesh = create_mesh()
        report.append(
            (True, f"mesh over {mesh.size} device(s), axes {mesh.axis_names}")
        )
    except Exception as e:
        report.append((False, f"create_mesh failed: {type(e).__name__}: {e}"))


def _check_checkpoint_dir(
    directory: str, report: list[tuple[bool, str]]
) -> None:
    """Round-trip a probe object under ``directory`` (works for local
    paths and object-store URLs alike) and report the resume state."""
    from .checkpoint import _as_path, checkpoint_exists, _latest

    try:
        path = _as_path(directory)
        path.mkdir(parents=True, exist_ok=True)
        probe = path / f".doctor-probe-{uuid.uuid4().hex}"
        probe.write_text("ok")
        assert probe.read_text() == "ok"
        probe.unlink()
        report.append((True, f"checkpoint dir {directory} is writable"))
    except Exception as e:
        report.append(
            (
                False,
                f"checkpoint dir {directory} failed the write probe:"
                f" {type(e).__name__}: {e}",
            )
        )
        return
    try:
        if checkpoint_exists(directory):
            latest = _latest(_as_path(directory))
            assert latest is not None
            report.append(
                (
                    True,
                    f"resume would restore generation {latest[0]}"
                    f" ({latest[1].name})",
                )
            )
        else:
            report.append((True, "no checkpoint yet; training starts fresh"))
    except Exception as e:
        report.append(
            (False, f"checkpoint probe failed: {type(e).__name__}: {e}")
        )


def _check_config(config_file: str, report: list[tuple[bool, str]]) -> None:
    """Build the config's algorithm and report what the hot path will
    actually do: sharding mode and every fused-kernel gate decision."""
    from .trainers import TrainConfig

    try:
        trainer = TrainConfig.from_file(config_file).build()
    except Exception as e:
        report.append(
            (False, f"config build failed: {type(e).__name__}: {e}")
        )
        return
    algo = trainer.algorithm
    hp = algo.hparams
    model = algo.policy.model  # type: ignore[attr-defined]
    report.append(
        (
            True,
            f"built {type(algo).__name__} on {type(algo.env).__name__}:"
            f" model {type(model).__name__},"
            f" num_envs={hp.num_envs}, horizon={hp.horizon}",
        )
    )
    mode = (
        "single-device"
        if algo.mesh is None
        else ("shard_map" if algo._axis is not None else "GSPMD exact")
    )
    report.append((True, f"execution mode: {mode}"))
    gates = {
        "fused update kernel": getattr(algo, "_fused_update", False),
        "fused act kernel": getattr(algo, "_fused_act", False),
        "fused custom forward": getattr(algo, "_fused_forward", False),
        "pallas GAE": getattr(algo, "_use_pallas_gae", False),
    }
    on = [k for k, v in gates.items() if v]
    off = [k for k, v in gates.items() if not v]
    report.append(
        (
            True,
            "fast paths on: " + (", ".join(on) if on else "none")
            + ("; off (XLA fallback): " + ", ".join(off) if off else ""),
        )
    )


def run_doctor(
    *,
    config_file: None | str = None,
    checkpoint_dir: None | str = None,
    print_fn: Any = print,
) -> int:
    """Run the bring-up checks; returns a process exit code (0 = all
    checks passed)."""
    report: list[tuple[bool, str]] = []
    _check_devices(report)
    _check_mesh(report)
    if checkpoint_dir:
        _check_checkpoint_dir(checkpoint_dir, report)
    if config_file:
        _check_config(config_file, report)
    for ok, line in report:
        print_fn(("ok: " if ok else "fail: ") + line)
    failed = sum(not ok for ok, _ in report)
    print_fn(
        f"{len(report) - failed}/{len(report)} checks passed"
        + (f", {failed} FAILED" if failed else "")
    )
    return 1 if failed else 0
