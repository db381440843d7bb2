"""Preemption-aware shutdown: SIGTERM → final checkpoint → clean return.

The reference loses everything on preemption (its only persistence is
the terminal policy export); ``PreemptionMonitor`` + ``Trainer.run``
turn the TPU pod eviction notice into a checkpoint-and-resume cycle.
The 2-process sync (one host's signal checkpoints BOTH) is covered in
``test_multihost.py``.
"""

import os
import signal
import time

from rl8_tpu import AlgorithmConfig, Trainer
from rl8_tpu.checkpoint import checkpoint_exists
from rl8_tpu.conditions import HitsUpperBound
from rl8_tpu.env import DiscreteDummyEnv
from rl8_tpu.preemption import PreemptionMonitor


def _wait_flag(monitor, timeout=5.0):
    deadline = time.monotonic() + timeout
    while not monitor.local_flag and time.monotonic() < deadline:
        time.sleep(0.01)
    return monitor.local_flag


def test_monitor_latches_sigterm_chains_and_restores_handler():
    prev = signal.getsignal(signal.SIGTERM)
    chained = []

    def outer(signum, frame):
        chained.append(signum)

    signal.signal(signal.SIGTERM, outer)
    try:
        with PreemptionMonitor() as monitor:
            assert not monitor.preempted()
            os.kill(os.getpid(), signal.SIGTERM)
            assert _wait_flag(monitor)
            assert monitor.preempted()
            # The pre-existing Python handler still observed the signal.
            assert chained == [signal.SIGTERM]
        # uninstall restored the previous disposition.
        assert signal.getsignal(signal.SIGTERM) is outer
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_monitor_request_without_signal():
    monitor = PreemptionMonitor()
    assert not monitor.preempted()
    monitor.request()
    assert monitor.preempted()


class _SigtermAtStep:
    """Never-stopping condition that delivers a real SIGTERM to this
    process when the step counter reaches ``at_step``."""

    def __init__(self, at_step: int) -> None:
        self.at_step = at_step

    def __call__(self, train_stats) -> bool:
        if train_stats["algorithm/steps"] == self.at_step:
            os.kill(os.getpid(), signal.SIGTERM)
        return False


def _build_trainer():
    algorithm = AlgorithmConfig(
        num_envs=16,
        horizon=8,
        seed=3,
        num_sgd_iters=1,
        model_config={"hiddens": (8, 8)},
    ).build(DiscreteDummyEnv)
    return Trainer(algorithm)


def test_run_checkpoints_and_returns_on_sigterm(tmp_path):
    prev = signal.getsignal(signal.SIGTERM)
    ckpt_dir = tmp_path / "ckpt"
    trainer = _build_trainer()
    stats = trainer.run(
        stop_conditions=[
            _SigtermAtStep(2),
            HitsUpperBound("algorithm/steps", 10),
        ],
        checkpoint_dir=ckpt_dir,
    )
    # The signal landed while evaluating step 2's stop conditions; the
    # run acted on it at the next step boundary — well short of the
    # 10-step bound — saving a final checkpoint and returning cleanly.
    assert stats["algorithm/steps"] == 3
    assert checkpoint_exists(ckpt_dir)
    # run() restored the SIGTERM disposition on the way out.
    assert signal.getsignal(signal.SIGTERM) == prev

    # Rerunning the same command auto-resumes from the preemption
    # checkpoint; the restored counters already satisfy a counter-keyed
    # stop bound, so the restart returns without training past it.
    restarted = _build_trainer()
    resumed = restarted.run(
        stop_conditions=[HitsUpperBound("algorithm/steps", 3)],
        checkpoint_dir=ckpt_dir,
    )
    assert resumed["algorithm/steps"] == 3
    assert restarted.state["algorithm/steps"] == 3


def test_run_preemption_with_fused_steps(tmp_path):
    prev = signal.getsignal(signal.SIGTERM)
    ckpt_dir = tmp_path / "ckpt"
    trainer = _build_trainer()
    stats = trainer.run(
        stop_conditions=[
            _SigtermAtStep(2),
            HitsUpperBound("algorithm/steps", 20),
        ],
        checkpoint_dir=ckpt_dir,
        fused_steps=2,
    )
    # The signal landed inside the first fused batch's stat loop; the
    # preemption check runs between fused batches.
    assert stats["algorithm/steps"] in (2, 4)
    assert stats["algorithm/steps"] < 20
    assert checkpoint_exists(ckpt_dir)
    assert signal.getsignal(signal.SIGTERM) == prev


def test_preemption_skips_pending_eval(tmp_path):
    """A latched SIGTERM is acted on BEFORE entering a multi-program
    eval, so the grace period isn't spent evaluating."""
    prev = signal.getsignal(signal.SIGTERM)
    ckpt_dir = tmp_path / "ckpt"
    trainer = _build_trainer()
    trainer.run(
        stop_conditions=[
            _SigtermAtStep(1),
            HitsUpperBound("algorithm/steps", 10),
        ],
        checkpoint_dir=ckpt_dir,
        steps_per_eval=1,
    )
    # Eval would have added horizons_per_env_reset collects beyond the
    # per-step ones; equality proves no eval ran after the signal.
    assert (
        trainer.state["algorithm/collects"] == trainer.state["algorithm/steps"]
    )
    assert checkpoint_exists(ckpt_dir)
    assert signal.getsignal(signal.SIGTERM) == prev


def test_install_off_main_thread_warns():
    """install() off the main thread can't register a handler; it must
    say so instead of silently dropping the protection."""
    import threading
    import warnings

    monitor = PreemptionMonitor()
    caught: list = []

    def target():
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            monitor.install()
            caught.extend(w)

    t = threading.Thread(target=target)
    t.start()
    t.join()
    assert any("NOT trigger a final checkpoint" in str(w.message) for w in caught)
    assert not monitor._installed


def test_counters_stay_ints(tmp_path):
    """env/steps remains an int through step, step_fused, and
    checkpoint restore (stats mappings float()-cast everything)."""
    trainer = _build_trainer()
    trainer.step()
    trainer.step_fused(2)
    assert type(trainer.state["env/steps"]) is int
    trainer.save_checkpoint(tmp_path / "ckpt")
    restarted = _build_trainer()
    restarted.restore_checkpoint(tmp_path / "ckpt")
    assert type(restarted.state["env/steps"]) is int


def test_jsonl_run_reserved_keys(tmp_path):
    """Metrics literally named 'step'/'time' can't overwrite the JSONL
    record's own step/timestamp fields."""
    import json

    from rl8_tpu.trainers.tracking import JsonlRun

    run = JsonlRun(tmp_path)
    run.log_metrics({"step": 99.0, "losses/total": 1.5}, step=7)
    with open(tmp_path / "metrics.jsonl") as f:
        record = json.loads(f.readline())
    assert record["step"] == 7
    assert record["losses/total"] == 1.5
