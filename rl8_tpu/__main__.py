"""Command-line interface: ``rl8-tpu train -f config.yaml``.

Counterpart of ``/root/reference/src/rl8/__main__.py``. Tracking goes to
a JSONL run directory (``--track-dir``) or MLflow when available and
requested (``--mlflow``).
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import tempfile

from .conditions import HitsUpperBound
from .trainers import TrainConfig
from .trainers.tracking import JsonlRun, MlflowRun, set_default_run

__all__ = ["main"]


def main(argv: None | list[str] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="rl8-tpu",
        description="TPU-native RL framework CLI (``__main__.py:21-99``).",
    )
    subparsers = parser.add_subparsers(dest="command", required=True)
    train_parser = subparsers.add_parser(
        "train", help="Train a policy from a YAML/JSON train config."
    )
    train_parser.add_argument(
        "-f",
        "--file",
        required=True,
        help="Path to a YAML or JSON train config file.",
    )
    train_parser.add_argument(
        "--experiment-name",
        default=None,
        help="Experiment name used for tracking.",
    )
    train_parser.add_argument(
        "--max-steps",
        type=int,
        default=100,
        help="Maximum number of algorithm steps before training stops.",
    )
    train_parser.add_argument(
        "--steps-per-eval",
        type=int,
        default=None,
        help="Trainer steps between policy evaluations.",
    )
    train_parser.add_argument(
        "--save",
        default=None,
        help="Directory to export the trained policy to.",
    )
    train_parser.add_argument(
        "--track-dir",
        default=None,
        help="Directory for JSONL metric tracking (a temp dir by default).",
    )
    train_parser.add_argument(
        "--checkpoint-dir",
        default=None,
        help="Directory for periodic full-state checkpoints. If it"
        " already holds a checkpoint, training resumes from it"
        " (preemption-safe restarts; --no-resume to overwrite).",
    )
    train_parser.add_argument(
        "--steps-per-checkpoint",
        type=int,
        default=None,
        help="Trainer steps between checkpoints (with --checkpoint-dir)."
        " Defaults to every step, or every fused batch with"
        " --fused-steps.",
    )
    train_parser.add_argument(
        "--no-resume",
        action="store_true",
        help="Ignore any existing checkpoint in --checkpoint-dir.",
    )
    train_parser.add_argument(
        "--fused-steps",
        type=int,
        default=None,
        help="Compile this many train steps into ONE device program"
        " (Trainer.step_fused) — the dispatch-amortized throughput path."
        " Must divide --steps-per-eval and --steps-per-checkpoint.",
    )
    train_parser.add_argument(
        "--async-checkpoints",
        action="store_true",
        help="Write periodic checkpoints in the background (training"
        " overlaps the write; all checkpoints are durable by exit).",
    )
    train_parser.add_argument(
        "--no-preemption-checkpoint",
        action="store_true",
        help="Don't catch SIGTERM for a final checkpoint before eviction"
        " (on by default with --checkpoint-dir).",
    )
    train_parser.add_argument(
        "--mlflow",
        action="store_true",
        help="Track with MLflow instead of JSONL files.",
    )
    doctor_parser = subparsers.add_parser(
        "doctor",
        help="Production bring-up checks: devices/topology, mesh,"
        " checkpoint storage, and per-config fused-kernel gates"
        " (docs/production.md). Exits non-zero if any check fails.",
    )
    doctor_parser.add_argument(
        "-f",
        "--file",
        default=None,
        help="Optional train config: builds it and reports the execution"
        " mode and every fused-kernel gate decision.",
    )
    doctor_parser.add_argument(
        "--checkpoint-dir",
        default=None,
        help="Optional checkpoint path/URL to probe (write round trip +"
        " resume state).",
    )
    args = parser.parse_args(argv)

    if args.command == "doctor":
        from .doctor import run_doctor

        return run_doctor(
            config_file=args.file, checkpoint_dir=args.checkpoint_dir
        )

    if args.command == "train" and not args.checkpoint_dir:
        # Checkpoint knobs without a destination would otherwise be
        # silently ignored — the user believes checkpoints are being
        # written when nothing ever is.
        for flag, value in (
            ("--async-checkpoints", args.async_checkpoints),
            ("--steps-per-checkpoint", args.steps_per_checkpoint),
        ):
            if value:
                parser.error(f"{flag} requires --checkpoint-dir")

    config = TrainConfig.from_file(args.file)
    if args.mlflow:
        import mlflow

        mlflow.set_experiment(args.experiment_name or "rl8-tpu")
        set_default_run(MlflowRun())
    else:
        track_dir = args.track_dir or tempfile.mkdtemp(
            prefix=f"{args.experiment_name or 'rl8-tpu'}-"
        )
        set_default_run(JsonlRun(track_dir))
        print(f"Tracking metrics to {track_dir}", file=sys.stderr)

    trainer = config.build()
    trainer.run(
        steps_per_eval=args.steps_per_eval,
        stop_conditions=[HitsUpperBound("algorithm/steps", args.max_steps)],
        checkpoint_dir=args.checkpoint_dir,
        steps_per_checkpoint=(
            # Default cadence: every step, or every fused batch — the
            # finest cadence run() accepts with --fused-steps.
            (args.steps_per_checkpoint or args.fused_steps or 1)
            if args.checkpoint_dir
            else None
        ),
        resume=not args.no_resume,
        checkpoint_on_preemption=not args.no_preemption_checkpoint,
        async_checkpoints=args.async_checkpoints,
        fused_steps=args.fused_steps,
    )
    if args.save:
        save_dir = pathlib.Path(args.save)
        save_dir.mkdir(parents=True, exist_ok=True)
        trainer.algorithm.policy.save(
            save_dir / "policy.pkl", trainer.algorithm.state.params
        )
        print(f"Saved policy to {save_dir / 'policy.pkl'}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
