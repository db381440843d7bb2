"""A/B the ``shuffle_block_rows=8`` default against exact row shuffles.

The default deviates from the reference's uniform row-level epoch
shuffle (``/root/reference/src/rl8/_utils.py:175-225``; deviation
recorded in PARITY.md). This harness backs the deviation with DATA: it
trains the tracked configs — with minibatched epochs, where the shuffle
actually executes (whole-buffer configs skip it as permutation-
invariant) — at ``shuffle_block_rows=1`` (exact reference semantics) vs
``8`` (default), multiple seeds each, over the full parity horizon, and
asserts the blk=8 arm's learning is indistinguishable from the blk=1
arm's seed band on BOTH parity criteria (final-quarter return and
env-steps to half-max).

Curves land in ``benchmarks/curves/ab_shuffle/`` (committed);
``--check-only`` re-asserts the committed curves without training.

Examples:
    python -m benchmarks.ab_shuffle                # run + check (TPU)
    python -m benchmarks.ab_shuffle --check-only   # assert committed
"""

from __future__ import annotations

import argparse
import json
import os
import time

from benchmarks.parity import (
    CONFIGS,
    PARITY_NUM_ENVS,
    _final_quarter_mean,
    _std,
    _steps_to_threshold,
    load_curve,
)

AB_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "curves", "ab_shuffle"
)

#: Configs where the epoch shuffle executes: quarter-buffer minibatches
#: (4 per epoch). Whole-buffer configs skip the shuffle entirely
#: (permutation-invariant), so an A/B there measures nothing.
AB_CONFIGS = ("cartpole", "algotrading", "recurrent")


def _build(name: str, seed: int, blk: int):
    from rl8_tpu import AlgorithmConfig, RecurrentAlgorithmConfig

    num_envs = PARITY_NUM_ENVS
    if name == "cartpole":
        from examples.cartpole.env import CartPole

        horizon = 64
        return AlgorithmConfig(
            horizon=horizon,
            num_envs=num_envs,
            seed=seed,
            sgd_minibatch_size=num_envs * horizon // 4,
            shuffle_block_rows=blk,
        ).build(CartPole)
    if name == "algotrading":
        from examples.algotrading.env import AlgoTrading
        from examples.algotrading.models import MischievousMule

        horizon = 32
        return AlgorithmConfig(
            model_cls=MischievousMule,
            num_envs=num_envs,
            seed=seed,
            sgd_minibatch_size=num_envs * horizon // 4,
            shuffle_block_rows=blk,
        ).build(AlgoTrading)
    if name == "recurrent":
        from rl8_tpu.env import DiscreteDummyEnv

        horizon, seq_len = 32, 4
        # Recurrent minibatches count SEQUENCES: quarter-buffer = a
        # quarter of the num_envs * (horizon // seq_len) sequence rows
        # (an all-rows minibatch would skip the shuffle entirely).
        return RecurrentAlgorithmConfig(
            num_envs=num_envs,
            seed=seed,
            sgd_minibatch_size=num_envs * (horizon // seq_len) // 4,
            shuffle_block_rows=blk,
        ).build(DiscreteDummyEnv)
    raise ValueError(name)


def run_arm(name: str, seed: int, blk: int) -> str:
    steps = CONFIGS[name]["steps"]
    algo = _build(name, seed, blk)
    records = []
    env_steps = 0
    start = time.perf_counter()
    for step in range(1, steps + 1):
        stats = algo.train_steps(1)[0]
        env_steps += int(stats["env/steps"])
        records.append(
            {
                "step": step,
                "env_steps": env_steps,
                "returns_mean": stats["returns/mean"],
                "returns_std": stats["returns/std"],
                "seconds": time.perf_counter() - start,
            }
        )
    os.makedirs(AB_DIR, exist_ok=True)
    path = os.path.join(AB_DIR, f"{name}_blk{blk}_seed{seed}.jsonl")
    meta = {
        "config": name,
        "seed": seed,
        "num_envs": PARITY_NUM_ENVS,
        "shuffle_block_rows": blk,
        "sgd_minibatches_per_epoch": 4,
        "source": "rl8_tpu",
    }
    with open(path, "w") as f:
        f.write(json.dumps({"meta": meta}) + "\n")
        for r in records:
            f.write(json.dumps(r) + "\n")
    return path


def _arm_curves(name: str, blk: int) -> list[list[dict]]:
    out = []
    for fn in sorted(os.listdir(AB_DIR)):
        if fn.startswith(f"{name}_blk{blk}_seed") and fn.endswith(".jsonl"):
            out.append(load_curve(os.path.join(AB_DIR, fn))[1])
    return out


def check_ab(name: str) -> dict:
    """Assert blk=8 learning is within blk=1's seed band, both criteria."""
    base = _arm_curves(name, 1)
    blk8 = _arm_curves(name, 8)
    assert base and blk8, f"no committed A/B curves for {name!r}"

    base_finals = [_final_quarter_mean(r) for r in base]
    blk8_finals = [_final_quarter_mean(r) for r in blk8]
    std = _std(base_finals) or abs(sum(base_finals) / len(base_finals)) * 0.05
    band_low = min(base_finals) - 2 * std

    starts = [r[0]["returns_mean"] for r in base]
    threshold = (sum(starts) / len(starts)) + 0.5 * (
        sum(base_finals) / len(base_finals) - sum(starts) / len(starts)
    )
    base_steps = [_steps_to_threshold(r, threshold) for r in base]
    blk8_steps = [_steps_to_threshold(r, threshold) for r in blk8]
    granularity = base[0][0]["env_steps"]
    allowed = max(s for s in base_steps if s is not None) + max(
        2 * _std([float(s) for s in base_steps if s is not None]),
        float(granularity),
    )

    summary = {
        "config": name,
        "blk1_final_returns": base_finals,
        "blk8_final_returns": blk8_finals,
        "band_low": band_low,
        "half_max_threshold": threshold,
        "blk1_steps_to_half_max": base_steps,
        "blk8_steps_to_half_max": blk8_steps,
        "allowed_steps_to_half_max": allowed,
    }
    for i, f8 in enumerate(blk8_finals):
        assert f8 >= band_low, (
            f"{name} blk8 seed {i}: final {f8:.3f} below the blk1 band"
            f" {band_low:.3f}"
        )
    for i, s in enumerate(blk8_steps):
        assert s is not None and s <= allowed, (
            f"{name} blk8 seed {i}: {s} env-steps to half-max vs blk1"
            f" {base_steps} (allowed <= {allowed:.0f})"
        )
    return summary


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("configs", nargs="*", default=list(AB_CONFIGS))
    parser.add_argument("--seeds", type=int, default=3)
    parser.add_argument("--check-only", action="store_true")
    args = parser.parse_args()
    for name in args.configs:
        if not args.check_only:
            for blk in (1, 8):
                for seed in range(args.seeds):
                    path = run_arm(name, seed, blk)
                    print(f"wrote {path}", flush=True)
        print(json.dumps(check_ab(name)), flush=True)


if __name__ == "__main__":
    main()
