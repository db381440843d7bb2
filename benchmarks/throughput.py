"""Throughput benchmark: env transitions/s with one policy update per
horizon (the reference's headline metric, ``README.md:8-10``).

Covers the default dummy-env configs, the three algotrading example
models (the reference's claim is that throughput holds for its example
models), and non-tiny regimes (wide torsos / attention) where the
system leaves the HBM-bound small-model regime.

Examples:
    python -m benchmarks.throughput
    python -m benchmarks.throughput --num-envs 16384 --horizon 64
    python -m benchmarks.throughput --recurrent
    python -m benchmarks.throughput --model mule --fused-forward
    python -m benchmarks.throughput --model alpaca
    python -m benchmarks.throughput --hiddens 1024,1024
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Callable


def _timed(fn: Callable[[], object]) -> float:
    start = time.perf_counter()
    fn()
    return time.perf_counter() - start


def _algotrading_config(
    model: str, hiddens, fused_forward: bool, amp: bool, **kwargs
):
    import jax.numpy as jnp

    from examples.algotrading.models import (
        AttentiveAlpaca,
        LazyLemur,
        MischievousMule,
    )
    from rl8_tpu import AlgorithmConfig, RecurrentAlgorithmConfig

    model_config: dict = {}
    if hiddens is not None:
        model_config["hiddens"] = hiddens
    if amp:
        model_config["dtype"] = jnp.bfloat16
    common = dict(
        model_config=model_config,
        accumulate_grads=amp,
        enable_amp=amp,
        **kwargs,
    )
    if model == "mule":
        return AlgorithmConfig(
            model_cls=MischievousMule, fused_forward=fused_forward, **common
        )
    if model == "alpaca":
        return AlgorithmConfig(
            model_cls=AttentiveAlpaca, fused_forward=fused_forward, **common
        )
    if model == "lemur":
        # seq_len * seqs_per_state_reset must divide the horizon; the
        # recurrent algorithm counts minibatch size in SEQUENCES, so
        # divide the transition-denominated size by seq_len to keep the
        # same minibatches-per-epoch as the feedforward models.
        common = dict(common)
        if common.get("sgd_minibatch_size"):
            common["sgd_minibatch_size"] //= 4
        return RecurrentAlgorithmConfig(
            model_cls=LazyLemur,
            seq_len=4,
            seqs_per_state_reset=2,
            fused_forward=fused_forward,
            **common,
        )
    raise ValueError(f"unknown algotrading model {model!r}")


def measure(
    *,
    num_envs: int,
    horizon: int,
    recurrent: bool = False,
    model: str | None = None,
    hiddens=None,
    fused_forward: bool = False,
    amp: bool = False,
    iters: int = 20,
    mesh=None,
) -> dict[str, float]:
    """Transitions/s for one tracked configuration.

    Args:
        model: ``None`` for the default models on the dummy envs, or an
            algotrading example model (``mule``/``alpaca``/``lemur``).
        hiddens: Torso widths override (e.g. ``(1024, 1024)`` for the
            FLOP-bound regime study in ``docs/performance.md``).
        fused_forward: Run custom-model forwards through the fused
            Pallas chain kernels (``ops/fused_mlp.py``).
        amp: bf16 compute + gradient accumulation (the tracked
            algotrading config).
    """
    from rl8_tpu import AlgorithmConfig, RecurrentAlgorithmConfig
    from rl8_tpu.env import DiscreteDummyEnv

    if model is not None:
        from examples.algotrading.env import AlgoTrading

        config = _algotrading_config(
            model,
            hiddens,
            fused_forward,
            amp,
            num_envs=num_envs,
            horizon=horizon,
            mesh=mesh,
            sgd_minibatch_size=num_envs * horizon // 4,
        )
        algo = config.build(AlgoTrading)
    elif recurrent:
        # The default recurrent model is parameterized by
        # hidden_size/num_layers rather than a hiddens tuple: map
        # ``--hiddens W,W,...`` to an equal-width stacked LSTM.
        if hiddens and len(set(hiddens)) > 1:
            raise ValueError(
                "--recurrent supports only equal-width --hiddens "
                f"(stacked LSTM layers share hidden_size); got {hiddens}"
            )
        model_config = (
            {"hidden_size": hiddens[0], "num_layers": len(hiddens)}
            if hiddens
            else {}
        )
        algo = RecurrentAlgorithmConfig(
            num_envs=num_envs,
            horizon=horizon,
            mesh=mesh,
            model_config=model_config,
        ).build(DiscreteDummyEnv)
    else:
        algo = AlgorithmConfig(
            num_envs=num_envs,
            horizon=horizon,
            mesh=mesh,
            model_config={"hiddens": hiddens} if hiddens else {},
        ).build(DiscreteDummyEnv)
    algo.train_steps(iters)  # warm the compile cache
    # Best of 3 timed repeats: remote-tunnel/host contention can dip a
    # single sample 2x, and the sustained rate is the max a config can
    # hold, not whichever sample the noise hit.
    elapsed = min(
        _timed(lambda: algo.train_steps(iters)) for _ in range(3)
    )
    return {
        "transitions_per_s": num_envs * horizon * iters / elapsed,
        "ms_per_iteration": elapsed / iters * 1e3,
        # The actual gate state: fused_forward=True silently falls back
        # off-TPU (or when the model/VMEM gates reject), so callers that
        # label results must not trust the requested flag.
        "fused_forward_active": bool(getattr(algo, "_fused_forward", False)),
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--num-envs", type=int, default=8192)
    parser.add_argument("--horizon", type=int, default=32)
    parser.add_argument("--recurrent", action="store_true")
    parser.add_argument(
        "--model",
        choices=("mule", "alpaca", "lemur"),
        default=None,
        help="benchmark an algotrading example model instead of the default",
    )
    parser.add_argument(
        "--hiddens",
        type=lambda s: tuple(int(x) for x in s.split(",")),
        default=None,
        help="torso widths, e.g. 1024,1024",
    )
    parser.add_argument("--fused-forward", action="store_true")
    parser.add_argument("--amp", action="store_true")
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()
    result = measure(
        num_envs=args.num_envs,
        horizon=args.horizon,
        recurrent=args.recurrent,
        model=args.model,
        hiddens=args.hiddens,
        fused_forward=args.fused_forward,
        amp=args.amp,
        iters=args.iters,
    )
    cfg = {k: v for k, v in vars(args).items() if v not in (None, False)}
    print(json.dumps({"config": cfg, **result}))


if __name__ == "__main__":
    main()
