"""Driver benchmark over BASELINE.md's tracked configs.

Prints one JSON line per tracked config — the headline metric first —
each shaped ``{"metric", "value", "unit", "vs_baseline"}``:

1. ``env_transitions_per_s_with_update`` — feedforward PPO on
   ``DiscreteDummyEnv``, reference default config (the reference's
   headline: ~1M transitions/s on one RTX 2080,
   ``/root/reference/README.md:8-10``).
2. ``recurrent_env_transitions_per_s_with_update`` — recurrent PPO on
   ``DiscreteDummyEnv`` (same 1M baseline: the reference claims its
   throughput with either flavor).
3. ``continuous_squashed_env_transitions_per_s_with_update`` —
   ``ContinuousDummyEnv`` + SquashedNormal with custom gamma/lambda
   (BASELINE.json tracked config #2).
4. ``cartpole_seconds_to_solve_post_compile`` — CartPole trained with the
   reference example's hyperparameters until the shaped return is
   near-optimal (``/root/reference/README.md:16-20`` claims "within
   seconds"; baseline set to 10 s, ``vs_baseline`` = baseline/measured so
   >1 is better).
5. ``algotrading_env_transitions_per_s_with_update`` — the algotrading
   example with gradient accumulation + mixed precision (tracked config
   #5; throughput baselined against the same 1M transitions/s).

For throughput metrics ``vs_baseline`` = measured / 1M (higher is
better).

After the five tracked configs, diagnostic lines cover the other two
algotrading example models (AttentiveAlpaca, LazyLemur — the reference
claims throughput holds across its example models), the 1024-wide
torso regime (where the width-aware kernel tiling engages), and the
serving path (jitted batch-bucketed ``PolicyModel.predict``,
predictions/s end to end including the DataFrame conversion).
"""

from __future__ import annotations

import json
import time

REFERENCE_TRANSITIONS_PER_S = 1_000_000.0
CARTPOLE_BASELINE_SECONDS = 10.0


def _throughput(algo, num_envs: int, horizon: int, iters: int = 20) -> float:
    algo.train_steps(iters)  # warm the compile cache
    # train_steps converts stats to host floats, which blocks on the
    # device work, so the wall clock is an honest end-to-end measure.
    # Best of 3 repeats: remote-tunnel/host contention can dip a single
    # sample 2x; the sustained rate is what the config can hold.
    elapsed = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        algo.train_steps(iters)
        elapsed = min(elapsed, time.perf_counter() - start)
    return num_envs * horizon * iters / elapsed


def _emit(metric: str, value: float, unit: str, vs_baseline: float) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": value,
                "unit": unit,
                "vs_baseline": vs_baseline,
            }
        ),
        flush=True,
    )


def bench_feedforward() -> None:
    from rl8_tpu import AlgorithmConfig
    from rl8_tpu.env import DiscreteDummyEnv

    # Default config (horizon=32, num_envs=8192, whole-buffer minibatch,
    # 4 SGD epochs) — mirrors the reference's defaults
    # (``/root/reference/src/rl8/algorithms/_feedforward.py:29-179``)
    # under which its ~1M transitions/s headline claim is made.
    num_envs, horizon = 8192, 32
    algo = AlgorithmConfig(num_envs=num_envs, horizon=horizon).build(
        DiscreteDummyEnv
    )
    tps = _throughput(algo, num_envs, horizon)
    _emit(
        "env_transitions_per_s_with_update",
        tps,
        "transitions/s",
        tps / REFERENCE_TRANSITIONS_PER_S,
    )


def bench_recurrent() -> None:
    from rl8_tpu import RecurrentAlgorithmConfig
    from rl8_tpu.env import DiscreteDummyEnv

    num_envs, horizon = 8192, 32
    algo = RecurrentAlgorithmConfig(num_envs=num_envs, horizon=horizon).build(
        DiscreteDummyEnv
    )
    tps = _throughput(algo, num_envs, horizon)
    _emit(
        "recurrent_env_transitions_per_s_with_update",
        tps,
        "transitions/s",
        tps / REFERENCE_TRANSITIONS_PER_S,
    )


def bench_continuous_squashed() -> None:
    from rl8_tpu import AlgorithmConfig
    from rl8_tpu.distributions import SquashedNormal
    from rl8_tpu.env import ContinuousDummyEnv

    num_envs, horizon = 8192, 32
    algo = AlgorithmConfig(
        num_envs=num_envs,
        horizon=horizon,
        distribution_cls=SquashedNormal,
        gamma=0.99,
        gae_lambda=0.95,
        entropy_coeff=0.0,
    ).build(ContinuousDummyEnv)
    tps = _throughput(algo, num_envs, horizon)
    _emit(
        "continuous_squashed_env_transitions_per_s_with_update",
        tps,
        "transitions/s",
        tps / REFERENCE_TRANSITIONS_PER_S,
    )


def bench_cartpole_time_to_solve() -> None:
    from examples.cartpole.env import CartPole
    from rl8_tpu import AlgorithmConfig

    # The reference example's run hyperparameters
    # (``/root/reference/examples/cartpole/__main__.py:11-22``).
    algo = AlgorithmConfig(horizon=64).build(CartPole)
    threshold = -16.0  # ~-0.25 shaped cost/step over 64 steps ~= solved
    algo.train_steps(1)  # compile + first step
    start = time.perf_counter()
    solved = False
    for _ in range(2, 101):
        stats = algo.train_steps(1)[0]
        if stats["returns/mean"] > threshold:
            solved = True
            break
    # When unsolved, report the full budget's wall time with
    # vs_baseline=0 — strictly-valid JSON either way (json.dumps of
    # float("inf") would emit the non-RFC `Infinity` token).
    value = time.perf_counter() - start
    print(
        json.dumps(
            {
                "metric": "cartpole_seconds_to_solve_post_compile",
                "value": value,
                "unit": "s",
                "vs_baseline": (
                    CARTPOLE_BASELINE_SECONDS / value if solved else 0.0
                ),
                "solved": solved,
            }
        ),
        flush=True,
    )


def _measure_algotrading(model: str, **kwargs) -> dict:
    """Measure an algotrading model through the fused custom-model path,
    falling back to the XLA autodiff path if the fused kernels fail on
    this platform (they are interpret-mode and TPU-gated, but a Mosaic
    compile rejection on an untested toolchain must not cost the tracked
    metric its number)."""
    from benchmarks.throughput import measure

    try:
        r = measure(model=model, fused_forward=True, **kwargs)
        r["fused"] = r["fused_forward_active"]
    except Exception:
        r = measure(model=model, fused_forward=False, **kwargs)
        r["fused"] = False
    return r


def bench_algotrading() -> None:
    # The tracked config: MischievousMule + AMP + gradient accumulation,
    # run through the fused Pallas chain kernels via the model's
    # FusedApplySpec (docs/custom-models.md), with autodiff fallback.
    num_envs, horizon = 4096, 32
    r = _measure_algotrading(
        "mule", amp=True, num_envs=num_envs, horizon=horizon, iters=5
    )
    tps = r["transitions_per_s"]
    print(
        json.dumps(
            {
                "metric": "algotrading_env_transitions_per_s_with_update",
                "value": tps,
                "unit": "transitions/s",
                "vs_baseline": tps / REFERENCE_TRANSITIONS_PER_S,
                "fused": r["fused"],
            }
        ),
        flush=True,
    )


def bench_example_models() -> None:
    """Per-model throughput for the other two algotrading example models
    (VERDICT r2 item 1: the reference claims throughput holds for its
    example models). Uses `benchmarks.throughput.measure` — the same
    harness as the ablation CLI — at the tracked algotrading shape."""
    for name in ("alpaca", "lemur"):
        r = _measure_algotrading(name, num_envs=4096, horizon=32, iters=5)
        tps = r["transitions_per_s"]
        print(
            json.dumps(
                {
                    "metric": (
                        f"algotrading_{name}"
                        "_env_transitions_per_s_with_update"
                    ),
                    "value": tps,
                    "unit": "transitions/s",
                    "vs_baseline": tps / REFERENCE_TRANSITIONS_PER_S,
                    "fused": r["fused"],
                }
            ),
            flush=True,
        )


def bench_serving() -> None:
    """Serving-path throughput: predictions/s through the jitted,
    batch-bucketed ``PolicyModel.predict`` (the reference's serving
    analog is eager-PyTorch pyfunc predict; no public baseline exists,
    so ``vs_baseline`` is reported against the training-path transition
    rate's 1M/s reference for scale)."""
    import numpy as np

    from rl8_tpu.data import DataKeys
    from rl8_tpu.policies import Policy
    from rl8_tpu.policies.serving import PolicyModel
    from rl8_tpu.specs import Discrete, Unbounded

    policy = Policy(Unbounded(4), Discrete(3, shape=(1,)))
    import jax

    model = PolicyModel(policy, policy.init_params(jax.random.key(0)))
    B, T = 4096, 1
    obs = np.random.default_rng(0).standard_normal((B, T, 4)).astype(np.float32)
    request = {DataKeys.OBS: obs}
    model.predict(request)  # compile
    reps = 20
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(reps):
            model.predict(request)
        best = min(best, time.perf_counter() - start)
    rate = B * T * reps / best
    _emit(
        "serving_predictions_per_s",
        rate,
        "predictions/s",
        rate / REFERENCE_TRANSITIONS_PER_S,
    )


def bench_wide_torso() -> None:
    """The non-tiny-model regime (VERDICT r2 item 4): default model with
    a 1024-wide twin torso, where the width-aware kernel tiling shrinks
    the row tile and the system leaves the HBM-bound small-model
    regime."""
    from benchmarks.throughput import measure

    r = measure(num_envs=8192, horizon=32, hiddens=(1024, 1024), iters=5)
    tps = r["transitions_per_s"]
    _emit(
        "wide_torso_1024_env_transitions_per_s_with_update",
        tps,
        "transitions/s",
        tps / REFERENCE_TRANSITIONS_PER_S,
    )


def main() -> None:
    bench_feedforward()
    for bench in (
        bench_recurrent,
        bench_continuous_squashed,
        bench_cartpole_time_to_solve,
        bench_algotrading,
        bench_example_models,
        bench_wide_torso,
        bench_serving,
    ):
        try:
            bench()
        except Exception as e:  # keep the headline line even if one
            # tracked config fails on this platform
            print(
                json.dumps(
                    {"metric": bench.__name__, "error": f"{type(e).__name__}: {e}"}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
