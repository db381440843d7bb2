"""Probe: is the fused-chain kernels' ~1.3ms fixed per-launch cost the
per-grid-step re-fetch of the many constant-index param buffers?
Same compute, params as (a) 12 separate VMEM buffers vs (b) one packed
buffer sliced in-kernel. Run on the real TPU. Not part of the suite."""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, H, TILE = 262144, 256, 4096


def _bf(x):
    return x.astype(jnp.bfloat16)


def _chain(x, w1, b1, w2, b2, hw):
    h1 = jnp.maximum(x[:, 0:1] * w1 + b1, 0.0)
    h2 = jnp.maximum(
        pl.dot(_bf(h1), _bf(w2)).astype(jnp.float32) + b2, 0.0
    )
    # narrow head: lane reduction (as in _dot)
    return jnp.sum(h2 * hw, axis=1, keepdims=True)


def kernel_sep(x_ref, *refs):
    (aw1, ab1, aw2, ab2, ahw, bw1, bb1, bw2, bb2, bhw, o1, o2) = refs
    x = x_ref[:]
    o1[:] = _chain(x, aw1[:], ab1[:], aw2[:], ab2[:], ahw[:])
    o2[:] = _chain(x, bw1[:], bb1[:], bw2[:], bb2[:], bhw[:])


def kernel_packed(x_ref, p_ref, o1, o2):
    x = x_ref[:]
    p = p_ref[:]

    def chain(base):
        w1 = p[base + 0 : base + 1, :]
        b1 = p[base + 1 : base + 2, :]
        w2 = p[base + 2 : base + 2 + H, :]
        b2 = p[base + 2 + H : base + 3 + H, :]
        hw = p[base + 3 + H : base + 4 + H, :]
        return _chain(x, w1, b1, w2, b2, hw)

    o1[:] = chain(0)
    o2[:] = chain(H + 4)


def main() -> None:
    key = jax.random.key(0)
    ks = jax.random.split(key, 12)
    x = jax.random.normal(ks[0], (N, 1))
    mk = lambda k, shape: 0.1 * jax.random.normal(k, shape)
    sep = [
        mk(ks[1], (1, H)), mk(ks[2], (1, H)), mk(ks[3], (H, H)),
        mk(ks[4], (1, H)), mk(ks[5], (1, H)),
        mk(ks[6], (1, H)), mk(ks[7], (1, H)), mk(ks[8], (H, H)),
        mk(ks[9], (1, H)), mk(ks[10], (1, H)),
    ]
    packed = jnp.concatenate(
        [sep[0], sep[1], sep[2], sep[3], sep[4],
         sep[5], sep[6], sep[7], sep[8], sep[9]], axis=0
    )  # [2*(H+4), H]

    grid = (N // TILE,)
    outs = [jax.ShapeDtypeStruct((N, 1), jnp.float32)] * 2
    out_specs = [pl.BlockSpec((TILE, 1), lambda i: (i, 0))] * 2
    x_spec = pl.BlockSpec((TILE, 1), lambda i: (i, 0))

    call_sep = pl.pallas_call(
        kernel_sep,
        grid=grid,
        in_specs=[x_spec] + [
            pl.BlockSpec(p.shape, lambda i: (0, 0)) for p in sep
        ],
        out_specs=out_specs,
        out_shape=outs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    call_packed = pl.pallas_call(
        kernel_packed,
        grid=grid,
        in_specs=[x_spec, pl.BlockSpec(packed.shape, lambda i: (0, 0))],
        out_specs=out_specs,
        out_shape=outs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )

    def timed(run):
        # Thread the carry through the kernel input so XLA cannot hoist
        # the (otherwise loop-invariant) call out of the scan.
        def body(c, _):
            os = run(x + c)
            c2 = 1e-20 * sum(jnp.sum(o) for o in os)
            return c2, ()

        fn = jax.jit(
            lambda c0: jax.lax.scan(body, c0, None, length=20)[0]
        )
        jax.block_until_ready(fn(jnp.zeros(())))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(jnp.zeros(())))
            best = min(best, time.perf_counter() - t0)
        return best / 20 * 1e3

    print(f"separate buffers : {timed(lambda xx: call_sep(xx, *sep)):7.3f} ms",
          flush=True)
    print(f"packed buffer    : {timed(lambda xx: call_packed(xx, packed)):7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
