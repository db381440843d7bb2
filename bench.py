"""Driver benchmark over BASELINE.md's tracked configs.

Prints one JSON line per tracked config — the headline metric first —
each shaped ``{"metric", "value", "unit", "vs_baseline", ...}``:

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
   #5; throughput baselined against the same 1M transitions/s). Runs the
   XLA autodiff path: the on-device ablation recorded in
   ``docs/performance.md`` measured it FASTER than the fused chain
   kernels for this config (3.80M vs 2.76M transitions/s), so the
   faster path is the default.

Throughput lines carry ``vs_baseline`` = measured / 1M (higher is
better) plus roofline fields from ``benchmarks/roofline.py``:
``mfu`` (analytic model-matmul FLOPs vs the v5e 197 TFLOP/s bf16 MXU
peak) and ``hbm_gbps_util`` (lower-bound HBM bytes vs the 819 GB/s HBM
peak) — see ``docs/performance.md`` § Roofline accounting.

After the five tracked configs, diagnostic lines cover the other two
algotrading example models (AttentiveAlpaca, LazyLemur), the 1024-wide
torso regime, and the serving path: throughput plus p50/p99 per-request
latency at several batch sizes, a recurrent-serving line, and
``vs_baseline`` stated as jitted-vs-eager speedup on the same request
(apples to apples on the same hardware).
"""

from __future__ import annotations

import json
import os
import time

import jax

from benchmarks import roofline

# Persistent compilation cache: the bench compiles ~10 large programs
# (fused train_steps scans, serving buckets); caching them across runs
# cuts a repeat bench from ~20 min of compiles to seconds of cache hits
# without touching any measured (post-warmup) timing.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_TRANSITIONS_PER_S = 1_000_000.0
CARTPOLE_BASELINE_SECONDS = 10.0


def _throughput(algo, num_envs: int, horizon: int, iters: int = 50) -> float:
    algo.train_steps(iters)  # warm the compile cache
    # train_steps converts stats to host floats, which blocks on the
    # device work, so the wall clock is an honest end-to-end measure.
    # Best of 3 repeats: remote-tunnel/host contention can dip a single
    # sample 2x; the sustained rate is what the config can hold.
    # 50-iteration windows: each train_steps call pays one tunnel round
    # trip (~27 ms on the bench link); production training runs far
    # longer windows still, so the sustained rate should not be charged
    # a per-20-iteration RTT (documented in docs/performance.md
    # section "Dispatch amortization").
    elapsed = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        algo.train_steps(iters)
        elapsed = min(elapsed, time.perf_counter() - start)
    return num_envs * horizon * iters / elapsed


#: Every record emitted this run, re-printed as ONE compact JSON line at
#: the very end so a tail-truncating capture always sees every metric.
_RECORDS: list[dict] = []


def _emit(
    metric: str, value: float, unit: str, vs_baseline: float, **extra
) -> None:
    record = {
        "metric": metric,
        "value": value,
        "unit": unit,
        "vs_baseline": vs_baseline,
        **extra,
    }
    _RECORDS.append(record)
    print(json.dumps(record), flush=True)


def _emit_summary() -> None:
    """Print a single compact JSON line holding EVERY tracked metric as
    the LAST stdout line. The driver's tail capture clips from the
    front, so the per-metric lines above can be lost — this line is the
    always-complete record (headline fields only: value, vs_baseline,
    mfu when present)."""
    keep = ("value", "vs_baseline", "mfu", "error")
    summary = {
        r["metric"]: {k: r[k] for k in keep if k in r} for r in _RECORDS
    }
    print(
        json.dumps(
            {"metric": "all_metrics", "summary": summary},
            separators=(",", ":"),
        ),
        flush=True,
    )


def _roofline_fields(
    tps: float,
    *,
    num_envs: int,
    horizon: int,
    fwd_flops_per_row: float,
    obs_dim: int,
    params_bytes: float,
    num_sgd_iters: int = 4,
    minibatches_per_epoch: int = 1,
) -> dict[str, float]:
    seconds_per_iter = num_envs * horizon / tps
    flops = roofline.iteration_flops(
        num_envs=num_envs,
        horizon=horizon,
        num_sgd_iters=num_sgd_iters,
        fwd_flops_per_row=fwd_flops_per_row,
    )
    hbm = roofline.iteration_hbm_floor(
        num_envs=num_envs,
        horizon=horizon,
        num_sgd_iters=num_sgd_iters,
        minibatches_per_epoch=minibatches_per_epoch,
        obs_dim=obs_dim,
        params_bytes=params_bytes,
    )
    return roofline.summarize(flops, hbm, seconds_per_iter)


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
        **_roofline_fields(
            tps,
            num_envs=num_envs,
            horizon=horizon,
            fwd_flops_per_row=roofline.twin_torso_flops(1, (256, 256), [2]),
            obs_dim=1,
            params_bytes=roofline.params_bytes_twin_torso(1, (256, 256), [2]),
        ),
    )


def bench_recurrent() -> None:
    from rl8_tpu import RecurrentAlgorithmConfig
    from rl8_tpu.env import DiscreteDummyEnv

    num_envs, horizon = 8192, 32
    algo = RecurrentAlgorithmConfig(num_envs=num_envs, horizon=horizon).build(
        DiscreteDummyEnv
    )
    tps = _throughput(algo, num_envs, horizon)
    # Default recurrent model: 1-layer LSTM(1 -> 256) + 2/1-wide heads.
    fwd = roofline.lstm_flops(1, 256, 1) + roofline.dense_chain_flops(
        [256, 2]
    ) + roofline.dense_chain_flops([256, 1])
    params = roofline.F32 * (4 * 256 * (1 + 256 + 2) + 256 * 3)
    _emit(
        "recurrent_env_transitions_per_s_with_update",
        tps,
        "transitions/s",
        tps / REFERENCE_TRANSITIONS_PER_S,
        **_roofline_fields(
            tps,
            num_envs=num_envs,
            horizon=horizon,
            fwd_flops_per_row=fwd,
            obs_dim=1,
            params_bytes=params,
        ),
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
        **_roofline_fields(
            tps,
            num_envs=num_envs,
            horizon=horizon,
            fwd_flops_per_row=roofline.twin_torso_flops(1, (256, 256), [1, 1]),
            obs_dim=1,
            params_bytes=roofline.params_bytes_twin_torso(
                1, (256, 256), [1, 1]
            ),
        ),
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
    _emit(
        "cartpole_seconds_to_solve_post_compile",
        value,
        "s",
        CARTPOLE_BASELINE_SECONDS / value if solved else 0.0,
        solved=solved,
    )


# The measured-faster forward path per algotrading model at the tracked
# shape (on-device ablation table in docs/performance.md § "Custom-model
# path ablation"): the fused chain kernels LOSE to XLA autodiff for
# these small custom models, so autodiff is the default here.
_ALGOTRADING_FUSED_DEFAULT = {"mule": False, "alpaca": False, "lemur": False}


def _measure_algotrading(model: str, **kwargs) -> dict:
    """Measure an algotrading model through its measured-faster forward
    path (``_ALGOTRADING_FUSED_DEFAULT``), falling back to XLA autodiff
    if the fused kernels fail on this platform."""
    from benchmarks.throughput import measure

    fused = _ALGOTRADING_FUSED_DEFAULT[model]
    try:
        r = measure(model=model, fused_forward=fused, **kwargs)
        r["fused"] = r["fused_forward_active"]
    except Exception:
        r = measure(model=model, fused_forward=False, **kwargs)
        r["fused"] = False
    return r


def bench_algotrading() -> None:
    # The tracked config: MischievousMule + AMP + gradient accumulation
    # (``/root/reference/examples/algotrading``; BASELINE.json config #5).
    num_envs, horizon = 4096, 32
    r = _measure_algotrading(
        "mule", amp=True, num_envs=num_envs, horizon=horizon, iters=50
    )
    tps = r["transitions_per_s"]
    fields = _roofline_fields(
        tps,
        num_envs=num_envs,
        horizon=horizon,
        fwd_flops_per_row=roofline.mule_flops(),
        obs_dim=6,
        params_bytes=roofline.params_bytes_twin_torso(7, (128, 128), [3]),
        minibatches_per_epoch=4,
    )
    _emit(
        "algotrading_env_transitions_per_s_with_update",
        tps,
        "transitions/s",
        tps / REFERENCE_TRANSITIONS_PER_S,
        fused=r["fused"],
        **fields,
    )


def bench_example_models() -> None:
    """Per-model throughput for the other two algotrading example models
    (the reference claims throughput holds for its example models). Uses
    `benchmarks.throughput.measure` — the same harness as the ablation
    CLI — at the tracked algotrading shape."""
    model_roofline = {
        "alpaca": dict(
            fwd_flops_per_row=roofline.alpaca_flops(),
            params_bytes=roofline.params_bytes_twin_torso(11, (64, 64), [3])
            + roofline.F32 * (8 * 24 + 8 * 8 + 8 * 64 + 64 * 8 + 8),
        ),
        "lemur": dict(
            fwd_flops_per_row=roofline.lemur_flops(),
            params_bytes=roofline.params_bytes_twin_torso(64, (64, 64), [3])
            + roofline.F32 * 4 * 64 * (4 + 64 + 2),
        ),
    }
    # amp=True: BASELINE.json's tracked algotrading config is
    # "grad-accum/mixed-precision", so the per-model diagnostic lines
    # run the same regime as the tracked MischievousMule line.
    for name in ("alpaca", "lemur"):
        r = _measure_algotrading(
            name, amp=True, num_envs=4096, horizon=32, iters=50
        )
        tps = r["transitions_per_s"]
        fields = _roofline_fields(
            tps,
            num_envs=4096,
            horizon=32,
            obs_dim=6,
            minibatches_per_epoch=4,
            **model_roofline[name],
        )
        _emit(
            f"algotrading_{name}_env_transitions_per_s_with_update",
            tps,
            "transitions/s",
            tps / REFERENCE_TRANSITIONS_PER_S,
            fused=r["fused"],
            **fields,
        )


def bench_wide_torso() -> None:
    """The non-tiny-model regime: default model with a 1024-wide twin
    torso, where the width-aware kernel tiling shrinks the row tile and
    the system leaves the HBM-bound small-model regime. The MFU figure
    is the check on docs/performance.md's FLOP-bound-regime claim."""
    from benchmarks.throughput import measure

    num_envs, horizon = 8192, 32
    r = measure(
        num_envs=num_envs, horizon=horizon, hiddens=(1024, 1024), iters=50
    )
    tps = r["transitions_per_s"]
    _emit(
        "wide_torso_1024_env_transitions_per_s_with_update",
        tps,
        "transitions/s",
        tps / REFERENCE_TRANSITIONS_PER_S,
        **_roofline_fields(
            tps,
            num_envs=num_envs,
            horizon=horizon,
            fwd_flops_per_row=roofline.twin_torso_flops(1, (1024, 1024), [2]),
            obs_dim=1,
            params_bytes=roofline.params_bytes_twin_torso(
                1, (1024, 1024), [2]
            ),
        ),
    )


def _latency_percentiles(fn, reps: int = 200) -> dict[str, float]:
    """p50/p99 per-request wall-clock latency of ``fn`` in ms."""
    import numpy as np

    times = []
    for _ in range(reps):
        start = time.perf_counter()
        fn()
        times.append((time.perf_counter() - start) * 1e3)
    return {
        "p50_ms": float(np.percentile(times, 50)),
        "p99_ms": float(np.percentile(times, 99)),
    }


def _dispatch_floor_ms() -> float:
    """p50 round-trip of a trivial one-op device program — the latency
    FLOOR any predict pays on this link (on the tunneled bench TPU this
    is tens of ms of RTT; on a local chip it is microseconds). Emitted
    on the serving lines so their absolute p50s read correctly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    one = jnp.ones(())
    add = jax.jit(lambda x: x + 1)
    jax.block_until_ready(add(one))
    times = []
    for _ in range(50):
        start = time.perf_counter()
        jax.block_until_ready(add(one))
        times.append((time.perf_counter() - start) * 1e3)
    return float(np.percentile(times, 50))


def bench_serving() -> None:
    """Serving-path metrics through the jitted, batch-bucketed
    ``PolicyModel.predict``: throughput at the bulk batch size, p50/p99
    per-request latency at single-row / mid / bulk batch sizes, and
    ``vs_baseline`` = speedup of the jitted bucketed path over the eager
    (un-jitted) sample on the SAME single-row request — the honest
    apples-to-apples basis on this hardware (the reference's serving
    path is eager torch pyfunc predict,
    ``/root/reference/src/rl8/policies/_feedforward.py:255-310``)."""
    import jax
    import numpy as np

    from rl8_tpu.data import DataKeys
    from rl8_tpu.policies import Policy
    from rl8_tpu.policies.serving import PolicyModel
    from rl8_tpu.specs import Discrete, Unbounded

    policy = Policy(Unbounded(4), Discrete(3, shape=(1,)))
    params = policy.init_params(jax.random.key(0))
    model = PolicyModel(policy, params)
    rng = np.random.default_rng(0)

    def request(B: int) -> dict:
        return {
            DataKeys.OBS: rng.standard_normal((B, 1, 4)).astype(np.float32)
        }

    # Throughput at the bulk size.
    B = 4096
    bulk = request(B)
    model.predict(bulk)  # compile
    reps = 20
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(reps):
            model.predict(bulk)
        best = min(best, time.perf_counter() - start)
    rate = B * reps / best

    # Eager (un-jitted) single-row baseline: the same sample the jitted
    # path runs, dispatched op by op.
    single = request(1)
    encoded = {DataKeys.OBS: policy.observation_spec.encode(single[DataKeys.OBS])}

    def eager_once() -> None:
        out = policy.sample(
            params,
            encoded,
            kind="all",
            deterministic=True,
            return_actions=True,
            return_logp=True,
            return_values=True,
        )
        jax.block_until_ready(out)

    eager_once()
    model.predict(single)  # compile the 1-row bucket
    eager = _latency_percentiles(eager_once, reps=50)
    jitted = _latency_percentiles(lambda: model.predict(single), reps=200)
    _emit(
        "serving_predictions_per_s",
        rate,
        "predictions/s",
        eager["p50_ms"] / jitted["p50_ms"],
        baseline_basis="jitted-vs-eager single-row p50 speedup",
        single_row_p50_ms=jitted["p50_ms"],
        single_row_p99_ms=jitted["p99_ms"],
        eager_single_row_p50_ms=eager["p50_ms"],
        dispatch_floor_ms=_dispatch_floor_ms(),
    )
    # Per-bucket latency percentiles (the bucketing design's whole point
    # is tail-latency/compile control).
    for B in (32, 1024, 4096):
        req = request(B)
        model.predict(req)  # compile this bucket
        pct = _latency_percentiles(lambda: model.predict(req), reps=100)
        _emit(
            f"serving_latency_b{B}",
            pct["p50_ms"],
            "ms",
            0.0,
            p99_ms=pct["p99_ms"],
        )


def bench_recurrent_serving() -> None:
    """Recurrent serving: jitted ``RecurrentPolicyModel.predict`` with
    state threading, single-row and bulk latency percentiles.
    ``vs_baseline`` = jitted-vs-eager single-row p50 speedup (same basis
    as the feedforward serving line)."""
    import jax
    import numpy as np

    from rl8_tpu.data import DataKeys
    from rl8_tpu.policies import RecurrentPolicy
    from rl8_tpu.policies.serving import RecurrentPolicyModel
    from rl8_tpu.specs import Discrete, Unbounded

    policy = RecurrentPolicy(Unbounded(4), Discrete(3, shape=(1,)))
    params = policy.init_params(jax.random.key(0))
    model = RecurrentPolicyModel(policy, params)
    rng = np.random.default_rng(0)

    def request(B: int) -> dict:
        return {
            DataKeys.OBS: rng.standard_normal((B, 1, 4)).astype(np.float32)
        }

    single = request(1)
    model.predict(single)  # compile
    jitted = _latency_percentiles(lambda: model.predict(single), reps=200)

    encoded = {DataKeys.OBS: policy.observation_spec.encode(single[DataKeys.OBS])}
    states = policy.init_states(1)

    def eager_once() -> None:
        out = policy.sample(
            params,
            encoded,
            states,
            deterministic=True,
            return_actions=True,
            return_logp=True,
            return_values=True,
        )
        jax.block_until_ready(out)

    eager_once()
    eager = _latency_percentiles(eager_once, reps=50)

    B = 4096
    bulk = request(B)
    model.predict(bulk)
    reps = 20
    start = time.perf_counter()
    for _ in range(reps):
        model.predict(bulk)
    rate = B * reps / (time.perf_counter() - start)
    _emit(
        "recurrent_serving_predictions_per_s",
        rate,
        "predictions/s",
        eager["p50_ms"] / jitted["p50_ms"],
        baseline_basis="jitted-vs-eager single-row p50 speedup",
        single_row_p50_ms=jitted["p50_ms"],
        single_row_p99_ms=jitted["p99_ms"],
        eager_single_row_p50_ms=eager["p50_ms"],
        dispatch_floor_ms=_dispatch_floor_ms(),
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
        bench_recurrent_serving,
    ):
        try:
            bench()
        except Exception as e:  # keep the headline line even if one
            # tracked config fails on this platform
            record = {
                "metric": bench.__name__,
                "error": f"{type(e).__name__}: {e}",
            }
            _RECORDS.append(record)
            print(json.dumps(record), flush=True)
    _emit_summary()


if __name__ == "__main__":
    main()
