"""Learning-curve parity runs: CartPole + Pendulum with the reference
examples' hyperparameters.

Runs each example with the exact run-script hyperparameters of the
reference (``/root/reference/examples/cartpole/__main__.py:11-22``:
horizon=64, 40 trainer steps; ``pendulum/__main__.py:11-23``:
horizon=128, horizons_per_env_reset=4, 100 trainer steps), writes
returns-vs-env-steps curves to ``benchmarks/curves/{name}.jsonl``, and
asserts the BASELINE.md targets:

- CartPole solves (shaped ``returns/mean`` near its 0 optimum) within
  the 40-step budget and within seconds of post-compile wall clock —
  the reference's "solved within seconds" claim
  (``/root/reference/README.md:16-20``).
- Pendulum's return improves substantially over training (the
  reference's docs figure shows the same qualitative curve; its reward
  shaping also peaks at 0).

Each JSONL record: ``{"step", "env_steps", "returns_mean",
"seconds_post_compile"}``. Curves are committed to the repo as the
parity artifact; re-run on TPU hardware to refresh.

Example:
    python -m benchmarks.parity            # run both, write curves
    python -m benchmarks.parity cartpole   # one env
"""

from __future__ import annotations

import json
import os
import sys
import time

CURVES_DIR = os.path.join(os.path.dirname(__file__), "curves")

#: Solve thresholds on the shaped ``returns/mean`` (both rewards peak at
#: 0 per step): CartPole ~-0.25/step over horizon 64; Pendulum averages
#: its cost over 128 steps after 4-horizon resets.
CARTPOLE_SOLVED = -16.0
PENDULUM_IMPROVEMENT = 0.5  # fraction of the initial cost eliminated


def _run(name: str, make_algo, max_steps: int) -> dict:
    algo = make_algo()
    records = []
    t0 = time.perf_counter()
    stats = algo.train_steps(1)[0]  # compile + first step
    compile_s = time.perf_counter() - t0
    start = time.perf_counter()
    env_steps = stats["env/steps"]
    records.append(
        {
            "step": 1,
            "env_steps": env_steps,
            "returns_mean": stats["returns/mean"],
            "seconds_post_compile": 0.0,
        }
    )
    for step in range(2, max_steps + 1):
        stats = algo.train_steps(1)[0]
        env_steps += stats["env/steps"]
        records.append(
            {
                "step": step,
                "env_steps": env_steps,
                "returns_mean": stats["returns/mean"],
                "seconds_post_compile": time.perf_counter() - start,
            }
        )
    os.makedirs(CURVES_DIR, exist_ok=True)
    path = os.path.join(CURVES_DIR, f"{name}.jsonl")
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return {
        "name": name,
        "compile_s": compile_s,
        "total_seconds_post_compile": records[-1]["seconds_post_compile"],
        "first_return": records[0]["returns_mean"],
        "best_return": max(r["returns_mean"] for r in records),
        "final_return": records[-1]["returns_mean"],
        "curve": path,
    }


def run_cartpole() -> dict:
    from examples.cartpole.env import CartPole
    from rl8_tpu import AlgorithmConfig

    summary = _run(
        "cartpole",
        lambda: AlgorithmConfig(horizon=64).build(CartPole),
        max_steps=40,
    )
    summary["solved"] = summary["best_return"] > CARTPOLE_SOLVED
    assert summary["solved"], (
        f"CartPole did not reach returns/mean > {CARTPOLE_SOLVED} within"
        f" 40 steps (best {summary['best_return']:.2f})"
    )
    assert summary["total_seconds_post_compile"] < 60.0, (
        "CartPole 40-step budget took"
        f" {summary['total_seconds_post_compile']:.1f}s post-compile —"
        " not 'within seconds'"
    )
    return summary


def run_pendulum() -> dict:
    from examples.pendulum.env import Pendulum
    from rl8_tpu import AlgorithmConfig

    summary = _run(
        "pendulum",
        lambda: AlgorithmConfig(
            horizon=128, horizons_per_env_reset=4
        ).build(Pendulum),
        max_steps=100,
    )
    first, best = summary["first_return"], summary["best_return"]
    improvement = (best - first) / abs(first) if first else 0.0
    summary["improvement"] = improvement
    assert improvement > PENDULUM_IMPROVEMENT, (
        f"Pendulum eliminated only {improvement:.0%} of its initial cost"
        f" ({first:.1f} -> {best:.1f})"
    )
    return summary


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    runners = {"cartpole": run_cartpole, "pendulum": run_pendulum}
    for name, runner in runners.items():
        if which in (name, "all"):
            print(json.dumps(runner()), flush=True)


if __name__ == "__main__":
    main()
