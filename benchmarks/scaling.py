"""Scaling sweep: throughput vs device count on the available mesh.

On a multi-chip TPU slice this measures real ICI scaling; on CPU it
exercises the shard_map code path over virtual devices (set
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``)
— useful for validating the scaling *shape*, not absolute numbers.

Examples:
    python -m benchmarks.scaling --num-envs-per-device 2048
"""

from __future__ import annotations

import argparse
import json

import jax


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--num-envs-per-device", type=int, default=2048)
    parser.add_argument("--horizon", type=int, default=32)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    from rl8_tpu.parallel import create_mesh

    from .throughput import measure

    devices = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    results = []
    for n in counts:
        mesh = create_mesh(devices[:n]) if n > 1 else None
        r = measure(
            num_envs=args.num_envs_per_device * n,
            horizon=args.horizon,
            recurrent=False,
            iters=args.iters,
            mesh=mesh,
        )
        results.append({"devices": n, **r})
        print(json.dumps(results[-1]))
    if len(results) > 1:
        eff = results[-1]["transitions_per_s"] / (
            results[0]["transitions_per_s"] * results[-1]["devices"]
        )
        print(json.dumps({"scaling_efficiency": eff}))


if __name__ == "__main__":
    main()
