"""Ablate the fused forward kernel's slow paths: narrow-head VPU lane
reductions (n < 8) vs MXU heads, and obs-dim-1 VPU outer product vs MXU
first layer. Run on the real TPU. Not part of the suite."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rl8_tpu.data import DataKeys
from rl8_tpu.models import DefaultDiscreteModel
from rl8_tpu.ops.fused_mlp import _default_chains, fused_chains
from rl8_tpu.specs import Discrete, Unbounded

N = 262144


def _time(fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main() -> None:
    key = jax.random.key(0)
    for obs_dim, n_act in ((1, 2), (1, 8), (8, 2), (8, 8), (1, 128)):
        model = DefaultDiscreteModel(
            Unbounded(obs_dim), Discrete(n_act, shape=(1,))
        )
        params = model.init(key, {DataKeys.OBS: jnp.zeros((1, obs_dim))})[
            "params"
        ]
        x = jax.random.normal(key, (N, obs_dim))

        def fwd_step(p, _):
            outs = fused_chains("relu", False, x, _default_chains(model, p))
            s = sum(jnp.sum(o) for outs_c in outs for o in outs_c)
            return jax.tree_util.tree_map(lambda q: q + 1e-12 * s, p), s

        fn = jax.jit(
            lambda p: jax.lax.scan(fwd_step, p, None, length=20)
        )
        ms = _time(fn, params)
        print(f"obs_dim={obs_dim:3d} n={n_act:3d}: fwd {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
