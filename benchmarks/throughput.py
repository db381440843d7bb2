"""Throughput benchmark: env transitions/s with one policy update per
horizon (the reference's headline metric, ``README.md:8-10``).

Examples:
    python -m benchmarks.throughput
    python -m benchmarks.throughput --num-envs 16384 --horizon 64
    python -m benchmarks.throughput --recurrent
"""

from __future__ import annotations

import argparse
import json
import time


def measure(
    *,
    num_envs: int,
    horizon: int,
    recurrent: bool,
    iters: int = 20,
    mesh=None,
) -> dict[str, float]:
    from rl8_tpu import AlgorithmConfig, RecurrentAlgorithmConfig
    from rl8_tpu.env import DiscreteDummyEnv

    if recurrent:
        algo = RecurrentAlgorithmConfig(
            num_envs=num_envs, horizon=horizon, mesh=mesh
        ).build(DiscreteDummyEnv)
    else:
        algo = AlgorithmConfig(
            num_envs=num_envs, horizon=horizon, mesh=mesh
        ).build(DiscreteDummyEnv)
    algo.train_steps(iters)  # warm the compile cache
    start = time.perf_counter()
    algo.train_steps(iters)
    elapsed = time.perf_counter() - start
    return {
        "transitions_per_s": num_envs * horizon * iters / elapsed,
        "ms_per_iteration": elapsed / iters * 1e3,
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--num-envs", type=int, default=8192)
    parser.add_argument("--horizon", type=int, default=32)
    parser.add_argument("--recurrent", action="store_true")
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()
    result = measure(
        num_envs=args.num_envs,
        horizon=args.horizon,
        recurrent=args.recurrent,
        iters=args.iters,
    )
    print(json.dumps({"config": vars(args), **result}))


if __name__ == "__main__":
    main()
