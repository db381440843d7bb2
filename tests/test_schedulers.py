"""Scheduler behavior tests, mirroring
``/root/reference/tests/test_schedulers.py``."""

import pytest

from rl8_tpu.schedulers import (
    ConstantScheduler,
    EntropyScheduler,
    InterpScheduler,
    LRScheduler,
    StepScheduler,
)


def test_constant_scheduler() -> None:
    s = ConstantScheduler(0.5)
    assert s.step(0) == 0.5
    assert s.step(10**9) == 0.5


def test_step_scheduler() -> None:
    s = StepScheduler([(0, 1.0), (100, 0.5), (200, 0.1)])
    assert s.step(0) == 1.0
    assert s.step(99) == 1.0
    assert s.step(100) == 0.5
    assert s.step(150) == 0.5
    assert s.step(200) == 0.1
    assert s.step(10**9) == 0.1


def test_interp_scheduler() -> None:
    s = InterpScheduler([(0, 0.0), (100, 1.0)])
    assert s.step(0) == 0.0
    assert s.step(50) == 0.5
    assert s.step(100) == 1.0
    assert s.step(200) == 1.0


def test_schedule_must_start_at_zero() -> None:
    with pytest.raises(ValueError):
        StepScheduler([(10, 1.0)])
    with pytest.raises(ValueError):
        InterpScheduler([(10, 1.0)])


def test_entropy_scheduler() -> None:
    s = EntropyScheduler(0.3)
    assert s.coeff == 0.3
    s.step(10**6)
    assert s.coeff == 0.3
    s = EntropyScheduler(0.3, schedule=[(0, 0.1), (100, 0.0)], kind="step")
    assert s.coeff == 0.1
    s.step(100)
    assert s.coeff == 0.0
    s = EntropyScheduler(0.3, schedule=[(0, 0.1), (100, 0.0)], kind="interp")
    s.step(50)
    assert abs(s.coeff - 0.05) < 1e-9


def test_lr_scheduler() -> None:
    s = LRScheduler(1e-3)
    assert s.coeff == 1e-3
    s.step(10**6)
    assert s.coeff == 1e-3
    s = LRScheduler(1e-3, schedule=[(0, 1e-3), (100, 1e-4)], kind="step")
    assert s.coeff == 1e-3
    s.step(100)
    assert s.coeff == 1e-4
