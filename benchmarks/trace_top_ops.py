"""Profile a tracked config and print the top device ops by self time.

Wraps ``jax.profiler`` around a few train iterations, then parses the
Chrome-trace JSON it writes (no TensorBoard needed on this box) and
aggregates device-lane event durations by op name. This is how the
"where does the iteration go" tables in ``docs/performance.md`` are
produced.

Examples:
    python -m benchmarks.trace_top_ops --model mule --phase collect
    python -m benchmarks.trace_top_ops --phase step --top 30
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import tempfile
from collections import defaultdict


def parse_trace(
    log_dir: str, top: int = 25, details: bool = False
) -> list[tuple[str, float, int]]:
    """Aggregate (name, total_ms, count) over device-lane complete events
    in the newest trace under ``log_dir``, longest first. With
    ``details``, the name carries the event's HLO metadata (long_name /
    source info from the event ``args``) so fusions are identifiable."""
    paths = sorted(
        glob.glob(
            os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True
        ),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Device lanes: pid names containing "TPU"/"Device" (host python
    # lanes would double-count the dispatch side).
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "Device" in name or "/device:" in name:
                device_pids.add(e.get("pid"))
    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    meta: dict[str, str] = {}
    for e in events:
        if e.get("ph") == "X" and (not device_pids or e.get("pid") in device_pids):
            totals[e["name"]] += e.get("dur", 0) / 1e3
            counts[e["name"]] += 1
            if details and e["name"] not in meta and e.get("args"):
                a = e["args"]
                meta[e["name"]] = " | ".join(
                    f"{k}={a[k]}"
                    for k in (
                        "long_name",
                        "hlo_op",
                        "hlo_module",
                        "source",
                        "tf_op",
                    )
                    if a.get(k)
                ) or json.dumps(a)[:400]
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    if details:
        return [
            (f"{name}  [{meta.get(name, '')}]", ms, counts[name])
            for name, ms in ranked
        ]
    return [(name, ms, counts[name]) for name, ms in ranked]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--model", choices=("mule", "alpaca", "lemur", None), default=None
    )
    parser.add_argument("--phase", choices=("collect", "step", "train"), default="train")
    parser.add_argument("--num-envs", type=int, default=4096)
    parser.add_argument("--horizon", type=int, default=32)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument(
        "--details",
        action="store_true",
        help="print each op's HLO metadata (long_name/source) so "
        "anonymous fusions are identifiable",
    )
    parser.add_argument(
        "--amp", action="store_true",
        help="bf16 compute + gradient accumulation (the tracked "
        "algotrading config)",
    )
    args = parser.parse_args()

    import jax

    from rl8_tpu import AlgorithmConfig

    if args.model:
        from benchmarks.throughput import _algotrading_config
        from examples.algotrading.env import AlgoTrading

        config = _algotrading_config(
            args.model,
            None,
            False,
            args.amp,
            num_envs=args.num_envs,
            horizon=args.horizon,
            sgd_minibatch_size=args.num_envs * args.horizon // 4,
        )
        algo = config.build(AlgoTrading)
    else:
        from rl8_tpu.env import DiscreteDummyEnv

        algo = AlgorithmConfig(
            num_envs=args.num_envs, horizon=args.horizon
        ).build(DiscreteDummyEnv)

    def run_once() -> None:
        if args.phase == "collect":
            algo.collect()
        elif args.phase == "step":
            algo.collect()
            algo.step()
        else:
            algo.train_steps(1)

    run_once()  # compile everything outside the trace
    with tempfile.TemporaryDirectory() as log_dir:
        with jax.profiler.trace(log_dir):
            for _ in range(args.iters):
                run_once()
        for name, ms, n in parse_trace(log_dir, args.top, args.details):
            print(f"{ms:10.2f} ms  x{n:<6} {name}")


if __name__ == "__main__":
    main()
