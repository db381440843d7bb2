"""Trace the fused fwd kernel scan: where does the ~1.3ms fixed
per-iteration cost sit? Not part of the suite."""

from __future__ import annotations

import tempfile

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks.trace_top_ops import parse_trace
from rl8_tpu.data import DataKeys
from rl8_tpu.models import DefaultDiscreteModel
from rl8_tpu.ops.fused_mlp import _default_chains, fused_chains
from rl8_tpu.specs import Discrete, Unbounded

N = 262144


def main() -> None:
    key = jax.random.key(0)
    model = DefaultDiscreteModel(Unbounded(1), Discrete(2, shape=(1,)))
    params = model.init(key, {DataKeys.OBS: jnp.zeros((1, 1))})["params"]
    x = jax.random.normal(key, (N, 1))

    def fwd_step(p, _):
        outs = fused_chains("relu", False, x, _default_chains(model, p))
        s = sum(jnp.sum(o) for outs_c in outs for o in outs_c)
        return jax.tree_util.tree_map(lambda q: q + 1e-12 * s, p), s

    fn = jax.jit(lambda p: jax.lax.scan(fwd_step, p, None, length=20))
    print("compiling/warming...", flush=True)
    jax.block_until_ready(fn(params))
    print("warm; tracing...", flush=True)
    with tempfile.TemporaryDirectory() as log_dir:
        with jax.profiler.trace(log_dir):
            jax.block_until_ready(fn(params))
        print("trace captured; parsing...", flush=True)
        for name, ms, n in parse_trace(log_dir, 20, details=True):
            print(f"{ms:10.3f} ms  x{n:<6} {name[:160]}")


if __name__ == "__main__":
    main()
