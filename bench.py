"""Headline benchmark: environment transitions/s with one policy update
per horizon on ``DiscreteDummyEnv`` (the reference's headline metric:
~1M transitions/s on one RTX 2080, ``/root/reference/README.md:8-10``).

Prints ONE JSON line: ``{"metric", "value", "unit", "vs_baseline"}``.
``vs_baseline`` is the ratio against the reference's 1M transitions/s.
"""

from __future__ import annotations

import json
import time

REFERENCE_TRANSITIONS_PER_S = 1_000_000.0


def main() -> None:
    from rl8_tpu import AlgorithmConfig
    from rl8_tpu.env import DiscreteDummyEnv

    # Default config (horizon=32, num_envs=8192, whole-buffer minibatch,
    # 4 SGD epochs) — mirrors the reference's defaults
    # (``/root/reference/src/rl8/algorithms/_feedforward.py:29-179``)
    # under which its ~1M transitions/s headline claim is made.
    num_envs = 8192
    horizon = 32
    algo = AlgorithmConfig(num_envs=num_envs, horizon=horizon).build(
        DiscreteDummyEnv
    )

    # Warmup (compile the fused multi-step train program).
    iters = 20
    algo.train_steps(iters)

    start = time.perf_counter()
    algo.train_steps(iters)
    # train_steps converts stats to host floats, which blocks on the
    # device work, so the wall clock is an honest end-to-end measure.
    elapsed = time.perf_counter() - start
    transitions_per_s = num_envs * horizon * iters / elapsed

    print(
        json.dumps(
            {
                "metric": "env_transitions_per_s_with_update",
                "value": transitions_per_s,
                "unit": "transitions/s",
                "vs_baseline": transitions_per_s / REFERENCE_TRANSITIONS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
