"""Record reference learning curves: run ``/root/reference``'s own PPO
on CPU at the example run-script hyperparameters and write
returns-vs-env-steps curves to ``benchmarks/curves/reference/``.

The reference examples' exact hyperparameters
(``/root/reference/examples/{cartpole,pendulum,mountain_car}/__main__.py``
and ``algotrading/__main__.py``):

- cartpole: horizon=64, defaults otherwise, 40 trainer steps
- pendulum: horizon=128, horizons_per_env_reset=4, 100 steps
- mountain_car: horizon=128, horizons_per_env_reset=4, 40 steps
- algotrading (MischievousMule): config defaults, Plateaus stop
- recurrent: RecurrentAlgorithm on DiscreteDummyEnv (tracked config #4)

``--num-envs`` overrides the config default (8192) because full-size
runs take hours of CPU per seed; the committed reference curves record
which value was used, and the parity test compares our curves against
reference curves AT THE SAME num_envs so the comparison stays
apples-to-apples.

Examples:
    python -m benchmarks.reference_impl.record cartpole --seeds 3
    python -m benchmarks.reference_impl.record pendulum --num-envs 1024
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shims")
REFERENCE = "/root/reference"
CURVES_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "curves", "reference"
)


def _setup_path() -> None:
    # The shims shadow nothing real (tensordict/torchrl/mlflow are not
    # installed). The reference's `examples/` is a namespace package
    # that this repo's regular `examples` package would always win
    # over, so it is mounted under the distinct name `ref_examples`.
    import types

    for p in (SHIMS, os.path.join(REFERENCE, "src")):
        if p not in sys.path:
            sys.path.insert(0, p)
    if "ref_examples" not in sys.modules:
        pkg = types.ModuleType("ref_examples")
        pkg.__path__ = [os.path.join(REFERENCE, "examples")]
        sys.modules["ref_examples"] = pkg


def _build(name: str, num_envs: int | None, seed: int):
    import torch

    torch.manual_seed(seed)
    from rl8 import AlgorithmConfig, RecurrentAlgorithmConfig

    overrides = {"num_envs": num_envs} if num_envs else {}
    if name == "cartpole":
        from ref_examples.cartpole.env import CartPole

        return AlgorithmConfig(horizon=64, **overrides).build(CartPole), 40
    if name == "pendulum":
        from ref_examples.pendulum.env import Pendulum

        return (
            AlgorithmConfig(
                horizon=128, horizons_per_env_reset=4, **overrides
            ).build(Pendulum),
            100,
        )
    if name == "mountain_car":
        from ref_examples.mountain_car.env import MountainCar

        return (
            AlgorithmConfig(
                horizon=128, horizons_per_env_reset=4, **overrides
            ).build(MountainCar),
            40,
        )
    if name == "algotrading":
        from ref_examples.algotrading.env import AlgoTrading
        from ref_examples.algotrading.models import MischievousMule

        return (
            AlgorithmConfig(model_cls=MischievousMule, **overrides).build(
                AlgoTrading
            ),
            40,
        )
    if name == "recurrent":
        from rl8.env import DiscreteDummyEnv

        return (
            RecurrentAlgorithmConfig(**overrides).build(DiscreteDummyEnv),
            40,
        )
    raise ValueError(f"unknown config {name!r}")


def record(
    name: str, *, num_envs: int | None = None, seed: int = 0, max_steps: int | None = None
) -> str:
    """Train the reference config and write one curve file; returns the
    path."""
    _setup_path()
    algo = None
    try:
        algo, steps = _build(name, num_envs, seed)
        if max_steps:
            steps = max_steps
        records = []
        env_steps = 0
        start = time.perf_counter()
        for step in range(1, steps + 1):
            collect_stats = algo.collect()
            step_stats = algo.step()
            env_steps += collect_stats["env/steps"]
            records.append(
                {
                    "step": step,
                    "env_steps": env_steps,
                    "returns_mean": collect_stats["returns/mean"],
                    "returns_std": collect_stats["returns/std"],
                    "seconds": time.perf_counter() - start,
                }
            )
            print(
                f"[{name} seed={seed}] step {step}/{steps}"
                f" returns/mean={collect_stats['returns/mean']:.4f}",
                flush=True,
            )
        os.makedirs(CURVES_DIR, exist_ok=True)
        path = os.path.join(CURVES_DIR, f"{name}_seed{seed}.jsonl")
        meta = {
            "config": name,
            "seed": seed,
            "num_envs": algo.hparams.num_envs,
            "horizon": algo.hparams.horizon,
            "source": "reference (/root/reference) on CPU via dep shims",
        }
        with open(path, "w") as f:
            f.write(json.dumps({"meta": meta}) + "\n")
            for r in records:
                f.write(json.dumps(r) + "\n")
        return path
    finally:
        del algo


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "configs",
        nargs="*",
        default=["cartpole", "pendulum"],
        help="configs to record (cartpole pendulum mountain_car algotrading recurrent)",
    )
    parser.add_argument("--num-envs", type=int, default=None)
    parser.add_argument("--seeds", type=int, default=1)
    parser.add_argument("--max-steps", type=int, default=None)
    args = parser.parse_args()
    for name in args.configs:
        for seed in range(args.seeds):
            path = record(
                name,
                num_envs=args.num_envs,
                seed=seed,
                max_steps=args.max_steps,
            )
            print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
