"""Fused rollout "act" kernel: model forward + action sampling + logp.

Each rollout step in the collect scan (the counterpart of the
reference's per-step ``policy.sample`` at
``/root/reference/src/rl8/algorithms/_feedforward.py:359-372``) runs a
small forward pass plus distribution sampling — a couple dozen small XLA
ops whose fixed costs dominate at typical batch sizes. This kernel
computes the default model's twin-chain forward, draws actions with the
TPU's native PRNG (Gumbel-argmax for categoricals, Box-Muller for
normals), and evaluates their log-probs and the value estimate in ONE
launch.

The sampling RNG is the TPU hardware PRNG seeded from the per-step JAX
key, NOT threefry — rollouts therefore differ bit-wise from the unfused
path at equal seeds while following the same distributions.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data import DataKeys
from .fused_mlp import (
    _chain_sizes,
    _flatten_params,
    _forward_block,
)

from .distmath import (
    key_to_seed,
    sample_continuous_actions,
    sample_discrete_actions,
)

__all__ = ["fused_act"]


def _discrete_act_kernel(
    sizes, activation, n_params, action_n, deterministic,
    seed_ref, x_ref, *refs,
):
    params = refs[:n_params]
    actions_ref, logp_ref, values_ref = refs[n_params:]
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0))

    x = x_ref[:]
    _, _, all_outs = _forward_block(x, params, sizes, activation)
    logits = all_outs[0][0]
    values_ref[:] = all_outs[1][0]
    logp_ref[:] = sample_discrete_actions(
        logits, action_n, deterministic, actions_ref
    )


def _continuous_act_kernel(
    sizes, activation, n_params, action_dim, deterministic, squashed,
    seed_ref, x_ref, *refs,
):
    params = refs[:n_params]
    actions_ref, logp_ref, values_ref = refs[n_params:]
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0))

    x = x_ref[:]
    _, _, all_outs = _forward_block(x, params, sizes, activation)
    mean, pre_log_std = all_outs[0]
    values_ref[:] = all_outs[1][0]
    actions, logp = sample_continuous_actions(
        mean, pre_log_std, deterministic, squashed
    )
    actions_ref[:] = actions
    logp_ref[:] = logp


def fused_act(
    model: Any,
    params: Any,
    batch: Any,
    key: jax.Array,
    *,
    deterministic: bool = False,
    squashed: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sample actions, their log-probs, and values for one rollout step
    with a single fused kernel.

    Supported model/distribution pairs match
    :func:`rl8_tpu.ops.fused_ppo.supports_fused_update`. Returns
    ``(actions, logp [B, 1], values [B, 1])``.
    """
    from ..models import DefaultContinuousModel, DefaultDiscreteModel

    from .fused_mlp import _default_chains

    obs = batch[DataKeys.OBS]
    # Widen narrow-float observations exactly like the fused update
    # path's packed-row transport (``ops/packing.py``), so both kernels
    # consume identical f32 inputs.
    if obs.dtype != jnp.float32:
        obs = obs.astype(jnp.float32)
    discrete = type(model) is DefaultDiscreteModel
    chains = _default_chains(model, params)
    flat = _flatten_params(chains)
    action_dim = model.action_spec.shape[0]
    if discrete:
        kernel = functools.partial(
            _discrete_act_kernel, _chain_sizes(chains), model.activation_fn,
            len(flat), model.action_spec.n, deterministic,
        )
        action_dtype = jnp.int32
    else:
        kernel = functools.partial(
            _continuous_act_kernel, _chain_sizes(chains), model.activation_fn,
            len(flat), action_dim, deterministic, squashed,
        )
        action_dtype = jnp.float32

    b = obs.shape[0]
    from .fused_mlp import _chain_tile

    tile = _chain_tile(b, chains, extra_row_factor=2)
    grid = (pl.cdiv(b, tile),)
    seed = key_to_seed(key)

    param_specs = [
        pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for p in flat
    ]
    actions, logp, values = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, obs.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=[
            pl.BlockSpec((tile, action_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, action_dim), action_dtype),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seed, obs, *flat)
    return actions, logp, values
