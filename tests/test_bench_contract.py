"""Contract tests for the driver-facing bench output format.

The driver tail-captures ``bench.py`` stdout and parses the LAST line;
round 4's capture clipped the headline metrics, so the bench now
re-emits every record in one compact JSON object printed last. These
tests pin that contract without running any benchmark.
"""

from __future__ import annotations

import json


def test_emit_summary_contains_every_record(capsys) -> None:
    import bench

    records = list(bench._RECORDS)
    try:
        bench._RECORDS.clear()
        bench._emit("metric_a", 1.5, "x/s", 2.0, mfu=0.25, extra_field=7)
        bench._emit("metric_b", 3.0, "ms", 0.0)
        bench._RECORDS.append({"metric": "broken_bench", "error": "E: boom"})
        bench._emit_summary()
    finally:
        bench._RECORDS.clear()
        bench._RECORDS.extend(records)

    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    # Every line is valid standalone JSON.
    parsed = [json.loads(l) for l in lines]
    # The LAST line is the all-metrics summary and names every record,
    # keeping the headline fields (value/vs_baseline/mfu/error).
    summary = parsed[-1]
    assert summary["metric"] == "all_metrics"
    s = summary["summary"]
    assert s["metric_a"] == {"value": 1.5, "vs_baseline": 2.0, "mfu": 0.25}
    assert s["metric_b"] == {"value": 3.0, "vs_baseline": 0.0}
    assert s["broken_bench"] == {"error": "E: boom"}
    # Compact: the summary must be one single line (tail-capture safe).
    assert "\n" not in json.dumps(s, separators=(",", ":"))


def test_emit_lines_are_driver_parseable(capsys) -> None:
    import bench

    records = list(bench._RECORDS)
    try:
        bench._RECORDS.clear()
        bench._emit("m", 1.0, "u", 0.5)
    finally:
        bench._RECORDS.clear()
        bench._RECORDS.extend(records)
    line = capsys.readouterr().out.strip()
    d = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(d)
