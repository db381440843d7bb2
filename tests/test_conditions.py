"""Stop-condition trigger logic, mirroring
``/root/reference/tests/test_conditions.py``."""

from rl8_tpu.conditions import (
    And,
    HitsLowerBound,
    HitsUpperBound,
    Plateaus,
    StopsDecreasing,
    StopsIncreasing,
)


def test_hits_lower_bound() -> None:
    c = HitsLowerBound("returns/mean", -10.0)
    assert not c({"returns/mean": 0.0})
    assert c({"returns/mean": -10.0})
    assert c({"returns/mean": -20.0})


def test_hits_upper_bound() -> None:
    c = HitsUpperBound("algorithm/steps", 5)
    assert not c({"algorithm/steps": 4})
    assert c({"algorithm/steps": 5})


def test_plateaus() -> None:
    c = Plateaus("losses/total", patience=2, rtol=0.1)
    assert not c({"losses/total": 1.0})
    assert not c({"losses/total": 1.01})
    assert c({"losses/total": 1.02})
    # A jump resets the counter.
    c = Plateaus("losses/total", patience=2, rtol=0.1)
    c({"losses/total": 1.0})
    c({"losses/total": 1.01})
    assert not c({"losses/total": 5.0})


def test_stops_decreasing() -> None:
    c = StopsDecreasing("losses/total", patience=2)
    assert not c({"losses/total": 2.0})
    assert not c({"losses/total": 1.0})
    assert not c({"losses/total": 1.5})
    assert c({"losses/total": 1.2})


def test_stops_increasing() -> None:
    c = StopsIncreasing("returns/mean", patience=2)
    assert not c({"returns/mean": 1.0})
    assert not c({"returns/mean": 0.5})
    assert c({"returns/mean": 0.7})


def test_and() -> None:
    c = And(
        [HitsUpperBound("algorithm/steps", 5), HitsLowerBound("losses/total", 0.1)]
    )
    assert not c({"algorithm/steps": 5, "losses/total": 1.0})
    assert not c({"algorithm/steps": 1, "losses/total": 0.0})
    assert c({"algorithm/steps": 5, "losses/total": 0.0})
