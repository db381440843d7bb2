"""Ad-hoc: time the default-config fused PPO kernel in isolation and
sweep the row-tile size (run on the real TPU). Not part of the suite."""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rl8_tpu.data import DataKeys
from rl8_tpu.models import DefaultDiscreteModel
from rl8_tpu.ops import fused_ppo
from rl8_tpu.ops import fused_mlp
from rl8_tpu.ops.packing import pack_rows
from rl8_tpu.specs import Discrete, Unbounded


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=262144)
    p.add_argument("--tiles", type=str, default="2048,4096,8192,16384")
    p.add_argument("--iters", type=int, default=40)
    args = p.parse_args()

    N = args.rows
    obs_spec, act_spec = Unbounded(1), Discrete(2, shape=(1,))
    model = DefaultDiscreteModel(obs_spec, act_spec)
    key = jax.random.key(0)
    params = model.init(key, {DataKeys.OBS: jnp.zeros((1, 1))})["params"]

    ks = jax.random.split(key, 5)
    mb = {
        DataKeys.VIEWS: {DataKeys.OBS: jax.random.normal(ks[0], (N, 1))},
        DataKeys.ACTIONS: jax.random.randint(ks[1], (N, 1), 0, 2),
        DataKeys.LOGP: -jnp.abs(jax.random.normal(ks[2], (N, 1))),
        DataKeys.ADVANTAGES: jax.random.normal(ks[3], (N, 1)),
        DataKeys.RETURNS: jax.random.normal(ks[4], (N, 1)),
    }
    packed, unpacker = pack_rows(mb)
    jax.block_until_ready(packed)
    cfg = fused_ppo.PPOLossConfig(
        clip_param=0.2, vf_clip_param=5.0, vf_coeff=1.0,
        dual_clip_param=None, n_rows=N, accum=1, use_entropy=False,
    )

    # 6 MXU matmuls of [N,256]x[256,256] per epoch (fwd h1W2 + bwd dW2 +
    # dh1, per torso).
    mxu_flops = 6 * N * 256 * 256 * 2
    print(f"MXU floor @197T: {mxu_flops / 197e12 * 1e3:.3f} ms")

    def step(tile, params, _):
        losses, kl, grads = fused_ppo.fused_ppo_grads(
            model, params, packed, unpacker, 0.0, cfg
        )
        new = jax.tree_util.tree_map(lambda p, g: p - 1e-6 * g, params, grads)
        return new, losses["total"]

    orig = fused_mlp._chain_tile
    for tile in [int(t) for t in args.tiles.split(",")]:
        fused_mlp._chain_tile = lambda n, chains, extra_row_factor=1: min(tile, n)
        try:
            fn = jax.jit(
                lambda p: jax.lax.scan(
                    functools.partial(step, tile), p, None, length=args.iters
                )
            )
            out = fn(params)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(params))
                best = min(best, time.perf_counter() - t0)
            ms = best / args.iters * 1e3
            print(
                f"tile={tile:6d}  {ms:7.3f} ms/epoch  "
                f"{mxu_flops / (ms / 1e3) / 1e12:6.1f} TF/s MXU-equiv"
            )
        except Exception as e:
            print(f"tile={tile:6d}  FAILED: {type(e).__name__}: {e}")
        finally:
            fused_mlp._chain_tile = orig


if __name__ == "__main__":
    main()
