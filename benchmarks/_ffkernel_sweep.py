"""Measure the default-config fused PPO update's per-stage device cost
on the real TPU: forward kernel alone, recompute+backward kernel, and
the full fused PPO-gradient kernel, at the tracked whole-buffer shape.
Produces the numbers behind docs/performance.md's default-config floor
table. Not part of the test suite."""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rl8_tpu.data import DataKeys
from rl8_tpu.models import DefaultDiscreteModel
from rl8_tpu.ops import fused_ppo
from rl8_tpu.ops.fused_mlp import _default_chains, fused_chains
from rl8_tpu.ops.packing import pack_rows
from rl8_tpu.specs import Discrete, Unbounded


def _time(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=262144)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument(
        "--stage", choices=("fwd", "bwd", "ppo", "all"), default="all"
    )
    args = p.parse_args()

    N, iters = args.rows, args.iters
    obs_spec, act_spec = Unbounded(1), Discrete(2, shape=(1,))
    model = DefaultDiscreteModel(obs_spec, act_spec)
    key = jax.random.key(0)
    params = model.init(key, {DataKeys.OBS: jnp.zeros((1, 1))})["params"]

    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (N, 1))
    mb = {
        DataKeys.VIEWS: {DataKeys.OBS: x},
        DataKeys.ACTIONS: jax.random.randint(ks[1], (N, 1), 0, 2),
        DataKeys.LOGP: -jnp.abs(jax.random.normal(ks[2], (N, 1))),
        DataKeys.ADVANTAGES: jax.random.normal(ks[3], (N, 1)),
        DataKeys.RETURNS: jax.random.normal(ks[4], (N, 1)),
    }
    packed, unpacker = pack_rows(mb)
    cfg = fused_ppo.PPOLossConfig(
        clip_param=0.2, vf_clip_param=5.0, vf_coeff=1.0,
        dual_clip_param=None, n_rows=N, accum=1, use_entropy=False,
    )
    # MXU volume: fwd h1@W2 per torso (2 passes); bwd dW2 + dh1 per
    # torso (4); head dW (N<8, runs padded on the MXU) ~0.5.
    big = N * 256 * 256 * 2
    print(f"rows={N}")
    print(f"one [N,256]x[256,256] pass @197T: {big / 197e12 * 1e3:.3f} ms")

    def run_scan(step):
        def fn(p):
            return jax.lax.scan(step, p, None, length=iters)

        return _time(jax.jit(fn), params, iters=iters)

    if args.stage in ("fwd", "all"):
        def fwd_step(p, _):
            outs = fused_chains("relu", False, x, _default_chains(model, p))
            s = sum(jnp.sum(o) for outs_c in outs for o in outs_c)
            return jax.tree_util.tree_map(lambda q: q + 1e-12 * s, p), s

        ms = run_scan(fwd_step)
        print(f"fwd kernel        : {ms:7.3f} ms  (2 MXU passes -> floor {2 * big / 197e12 * 1e3:.2f})")

    if args.stage in ("bwd", "all"):
        def bwd_step(p, _):
            def loss(q):
                outs = fused_chains("relu", False, x, _default_chains(model, q))
                return sum(jnp.sum(o) for outs_c in outs for o in outs_c)

            g = jax.grad(loss)(p)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, p, g), 0.0

        ms = run_scan(bwd_step)
        print(f"fwd+bwd kernels   : {ms:7.3f} ms  (2+6.5 MXU passes -> floor {8.5 * big / 197e12 * 1e3:.2f})")

    if args.stage in ("ppo", "all"):
        def ppo_step(p, _):
            losses, kl, grads = fused_ppo.fused_ppo_grads(
                model, p, packed, unpacker, 0.0, cfg
            )
            new = jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, p, grads)
            return new, losses["total"]

        ms = run_scan(ppo_step)
        print(f"full PPO kernel   : {ms:7.3f} ms  (6.5 MXU passes -> floor {6.5 * big / 197e12 * 1e3:.2f})")


if __name__ == "__main__":
    main()
