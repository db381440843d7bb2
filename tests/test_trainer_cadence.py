"""Fast host-logic matrix tests for ``GenericTrainerBase.run()``.

``run()`` interleaves five cadences — ``fused_steps`` ×
``steps_per_eval`` × ``steps_per_checkpoint`` × preemption ×
stop-conditions — whose interplay lives entirely in host Python
(``rl8_tpu/trainers/_base.py:155-360``). The integration paths are
covered by the slow 2-process multihost suite; this file pins the
cadence arithmetic in milliseconds with a counter-only stub algorithm
(no devices, no jit), extending the scope of
``/root/reference/tests/test_trainers.py`` to the TPU-new flags.
"""

from __future__ import annotations

import signal
from typing import Any

import pytest

from rl8_tpu.conditions import HitsUpperBound
from rl8_tpu.trainers._base import GenericTrainerBase

NUM_ENVS = 4
HORIZON = 2
STEP_TRANSITIONS = NUM_ENVS * HORIZON


class StubAlgorithm:
    """Counter-only fake honoring the algorithm surface ``run()`` uses.

    ``preempt_on_step`` raises ``SIGTERM`` *during* that step's device
    work (1-indexed by ``algorithm/steps`` as seen after the step), the
    way a pod eviction lands mid-program; the trainer must only act on
    it at the next step boundary.
    """

    horizons_per_env_reset = 1
    params: dict[str, Any] = {"stub": True}

    def __init__(self, *, preempt_on_step: int | None = None) -> None:
        self.collects = 0
        self.steps = 0
        self.eval_collects = 0
        self.preempt_on_step = preempt_on_step

    def memory_stats(self) -> dict[str, float]:
        return {"memory/free": 1.0}

    def collect(
        self,
        *,
        env_config: None | dict[str, Any] = None,
        deterministic: bool = False,
    ) -> dict[str, float]:
        self.collects += 1
        if deterministic:
            self.eval_collects += 1
        return {"env/steps": float(STEP_TRANSITIONS), "returns/mean": 0.0}

    def _one_step(self) -> dict[str, float]:
        self.steps += 1
        if self.preempt_on_step == self.steps:
            signal.raise_signal(signal.SIGTERM)
        return {"losses/total": 0.0}

    def step(self) -> dict[str, float]:
        return self._one_step()

    def train_steps(
        self, num_steps: int, *, env_config: None | dict[str, Any] = None
    ) -> list[dict[str, float]]:
        out = []
        for _ in range(num_steps):
            self.collects += 1
            out.append({**self.collect(), **self._one_step()})
            self.collects -= 1  # collect() above double-counts
        return out


class RecordingTrainer(GenericTrainerBase[Any]):
    """Records checkpoint saves/restores instead of touching orbax."""

    def __init__(self, algorithm: Any, **kwargs: Any) -> None:
        super().__init__(algorithm, **kwargs)
        self.saved_at: list[int] = []
        self.restores = 0

    def save_checkpoint(self, directory: Any, /, *, block: bool = True) -> None:
        self.saved_at.append(self.state["algorithm/steps"])

    def restore_checkpoint(self, directory: Any, /) -> None:
        self.restores += 1


STOP_AT = 8


@pytest.mark.parametrize("fused_steps", [None, 2, 4])
@pytest.mark.parametrize("steps_per_eval", [None, 2, 4])
@pytest.mark.parametrize("steps_per_checkpoint", [None, 2, 4])
def test_cadence_matrix(
    tmp_path, fused_steps, steps_per_eval, steps_per_checkpoint
) -> None:
    if fused_steps and (
        (steps_per_eval and steps_per_eval % fused_steps)
        or (steps_per_checkpoint and steps_per_checkpoint % fused_steps)
    ):
        # Rejected combinations (ValueError) — covered below.
        pytest.skip("fused_steps must divide the eval/checkpoint cadences")
    algo = StubAlgorithm()
    trainer = RecordingTrainer(algo)
    stats = trainer.run(
        fused_steps=fused_steps,
        steps_per_eval=steps_per_eval,
        steps_per_checkpoint=steps_per_checkpoint,
        checkpoint_dir=tmp_path if steps_per_checkpoint else None,
        stop_conditions=[HitsUpperBound("algorithm/steps", STOP_AT)],
    )
    # The stop condition fires on the step that reaches the bound, never
    # later — even mid-fused-batch (per-record check) and regardless of
    # eval/checkpoint cadence.
    assert trainer.state["algorithm/steps"] == STOP_AT
    assert stats["algorithm/steps"] == STOP_AT
    assert algo.steps == STOP_AT
    assert trainer.state["env/steps"] == STOP_AT * STEP_TRANSITIONS

    # Evals run exactly on multiples of steps_per_eval strictly before
    # the stopping step (the stop short-circuits the boundary at 8).
    expected_evals = (
        [s for s in range(1, STOP_AT) if s % steps_per_eval == 0]
        if steps_per_eval
        else []
    )
    assert algo.eval_collects == len(expected_evals)
    assert (
        trainer.state["algorithm/collects"]
        == STOP_AT + len(expected_evals) * algo.horizons_per_env_reset
    )

    # Checkpoints land on every multiple of steps_per_checkpoint,
    # INCLUDING the stopping step when it is one.
    expected_ckpts = (
        [s for s in range(1, STOP_AT + 1) if s % steps_per_checkpoint == 0]
        if steps_per_checkpoint
        else []
    )
    assert trainer.saved_at == expected_ckpts


@pytest.mark.parametrize("fused_steps", [None, 2])
@pytest.mark.parametrize("preempt_on_step", [2, 3, 4])
def test_preemption_stops_at_next_boundary(
    tmp_path, fused_steps, preempt_on_step
) -> None:
    """SIGTERM during step k stops the run at the next step boundary —
    after step k unfused, after k's fused batch when fused — with
    exactly one final blocking checkpoint."""
    algo = StubAlgorithm(preempt_on_step=preempt_on_step)
    trainer = RecordingTrainer(algo)
    trainer.run(
        fused_steps=fused_steps,
        checkpoint_dir=tmp_path,
        stop_conditions=[HitsUpperBound("algorithm/steps", STOP_AT)],
    )
    if fused_steps:
        batch = fused_steps
        expected_stop = ((preempt_on_step + batch - 1) // batch) * batch
    else:
        expected_stop = preempt_on_step
    assert trainer.state["algorithm/steps"] == expected_stop
    assert algo.steps == expected_stop
    assert trainer.saved_at == [expected_stop]


@pytest.mark.parametrize("fused_steps", [None, 2])
def test_preemption_guards_eval_entry(tmp_path, fused_steps) -> None:
    """A pending eviction notice at a steps_per_eval boundary saves and
    returns INSTEAD of entering the multi-program eval
    (``trainers/_base.py`` eval-entry preempt checks)."""
    algo = StubAlgorithm(preempt_on_step=2)
    trainer = RecordingTrainer(algo)
    trainer.run(
        fused_steps=fused_steps,
        steps_per_eval=2,
        checkpoint_dir=tmp_path,
        stop_conditions=[HitsUpperBound("algorithm/steps", STOP_AT)],
    )
    assert trainer.state["algorithm/steps"] == 2
    assert algo.eval_collects == 0, "eval must not start after a preempt"
    assert trainer.saved_at == [2]


def test_restored_counters_satisfy_stop(tmp_path, monkeypatch) -> None:
    """A restart of an already-finished job returns the restored
    counters without training (``trainers/_base.py`` restored-counter
    early return), and loss-keyed conditions that KeyError on the
    counter-only stats are skipped rather than fatal."""
    import rl8_tpu.checkpoint as checkpoint

    monkeypatch.setattr(
        checkpoint, "checkpoint_exists", lambda d, agree=False: True
    )
    algo = StubAlgorithm()
    trainer = RecordingTrainer(algo)

    def fake_restore(directory, /):
        trainer.restores += 1
        trainer.state["algorithm/steps"] = STOP_AT + 2
        trainer.state["algorithm/collects"] = STOP_AT + 2
        trainer.state["env/steps"] = (STOP_AT + 2) * STEP_TRANSITIONS

    monkeypatch.setattr(trainer, "restore_checkpoint", fake_restore)
    stats = trainer.run(
        checkpoint_dir=tmp_path,
        stop_conditions=[
            HitsUpperBound("losses/total", -1.0),  # KeyError → skipped
            HitsUpperBound("algorithm/steps", STOP_AT),
        ],
    )
    assert trainer.restores == 1
    assert algo.steps == 0, "no training step may run"
    assert stats["algorithm/steps"] == STOP_AT + 2
    assert "losses/total" not in stats


def test_restored_counters_below_stop_continue(tmp_path, monkeypatch) -> None:
    """A resumed run whose counters are below the bound trains the
    remaining steps only."""
    import rl8_tpu.checkpoint as checkpoint

    monkeypatch.setattr(
        checkpoint, "checkpoint_exists", lambda d, agree=False: True
    )
    algo = StubAlgorithm()
    trainer = RecordingTrainer(algo)

    def fake_restore(directory, /):
        trainer.state["algorithm/steps"] = 5
        trainer.state["algorithm/collects"] = 5
        trainer.state["env/steps"] = 5 * STEP_TRANSITIONS

    monkeypatch.setattr(trainer, "restore_checkpoint", fake_restore)
    trainer.run(
        checkpoint_dir=tmp_path,
        stop_conditions=[HitsUpperBound("algorithm/steps", STOP_AT)],
    )
    assert algo.steps == STOP_AT - 5
    assert trainer.state["algorithm/steps"] == STOP_AT
