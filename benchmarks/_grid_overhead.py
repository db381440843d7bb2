"""Measure per-grid-step Pallas overhead and fwd-kernel row scaling on
the real TPU. Not part of the suite."""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rl8_tpu.data import DataKeys
from rl8_tpu.models import DefaultDiscreteModel
from rl8_tpu.ops.fused_mlp import _default_chains, fused_chains
from rl8_tpu.specs import Discrete, Unbounded


def _time(fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def bench_trivial_grid() -> None:
    """A near-empty kernel (copy one [8,128] block) at several grid
    lengths: the slope is the per-grid-step sequencer overhead."""

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    for steps in (8, 64, 256):
        x = jnp.zeros((steps * 8, 128))
        call = pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )

        def run(x):
            def body(c, _):
                return call(c), ()

            return jax.lax.scan(body, x, None, length=20)[0]

        ms = _time(jax.jit(run), x)
        print(f"trivial grid steps={steps:4d}: {ms:7.3f} ms "
              f"({ms / steps * 1e3:6.1f} us/step)", flush=True)


def bench_fwd_rows() -> None:
    key = jax.random.key(0)
    model = DefaultDiscreteModel(Unbounded(1), Discrete(2, shape=(1,)))
    params = model.init(key, {DataKeys.OBS: jnp.zeros((1, 1))})["params"]
    for N in (32768, 131072, 262144):
        x = jax.random.normal(key, (N, 1))

        def fwd_step(p, _):
            outs = fused_chains("relu", False, x, _default_chains(model, p))
            s = sum(jnp.sum(o) for outs_c in outs for o in outs_c)
            return jax.tree_util.tree_map(lambda q: q + 1e-12 * s, p), s

        fn = jax.jit(lambda p: jax.lax.scan(fwd_step, p, None, length=20))
        ms = _time(fn, params)
        print(f"fwd rows={N:7d} (grid {N // 4096:3d}): {ms:7.3f} ms "
              f"({ms / N * 1e6:5.1f} ns/row)", flush=True)


if __name__ == "__main__":
    bench_trivial_grid()
    bench_fwd_rows()
