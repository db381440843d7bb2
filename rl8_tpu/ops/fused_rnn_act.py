"""Fused recurrent rollout "act" kernel: LSTM cell + heads + sampling.

Recurrent analog of ``ops/fused_act.py``: one kernel launch per collect
step runs the stacked ``OptimizedLSTMCell`` math (up to 8 layers), the
policy/value heads, and TPU-hardware-PRNG action sampling, returning
the new recurrent states alongside actions/log-probs/values. The reference runs
the same computation as ~50 per-step eager torch ops
(``/root/reference/src/rl8/algorithms/_recurrent.py:394-417``).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data import DataKeys
from .distmath import (
    key_to_seed,
    sample_continuous_actions,
    sample_discrete_actions,
)
from .fused_mlp import _dot

__all__ = ["fused_rnn_act"]


def _kernel(
    dims,  # (H, K, kind, action_meta, deterministic, squashed)
    seed_ref,
    x_ref,
    h_ref,
    c_ref,
    *refs,
):
    H, K, kind, action_meta, deterministic, squashed = dims
    n_heads = 2 if kind == "discrete" else 3
    lstm_refs = refs[: 3 * K]
    head_refs = refs[3 * K : 3 * K + 2 * n_heads]
    actions_ref, logp_ref, values_ref, h_out_ref, c_out_ref = refs[
        3 * K + 2 * n_heads :
    ]
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0))

    x = x_ref[:]
    h_cols = h_ref[:]  # [tile, K * H]
    c_cols = c_ref[:]
    for l in range(K):
        h = h_cols[:, l * H : (l + 1) * H]
        c = c_cols[:, l * H : (l + 1) * H]
        wi, wh, b = (
            lstm_refs[3 * l][:],
            lstm_refs[3 * l + 1][:],
            lstm_refs[3 * l + 2][:],
        )
        z = _dot(x, wi) + _dot(h, wh) + b
        gi = jax.nn.sigmoid(z[:, 0:H])
        gf = jax.nn.sigmoid(z[:, H : 2 * H])
        gg = jnp.tanh(z[:, 2 * H : 3 * H])
        go = jax.nn.sigmoid(z[:, 3 * H : 4 * H])
        c = gf * c + gi * gg
        h = go * jnp.tanh(c)
        h_out_ref[:, l * H : (l + 1) * H] = h
        c_out_ref[:, l * H : (l + 1) * H] = c
        x = h  # feeds the next layer

    if kind == "discrete":
        _, n = action_meta
        logits = _dot(h, head_refs[0][:]) + head_refs[1][:]
        values_ref[:] = _dot(h, head_refs[2][:]) + head_refs[3][:]
        logp_ref[:] = sample_discrete_actions(
            logits, n, deterministic, actions_ref
        )
    else:
        mean = _dot(h, head_refs[0][:]) + head_refs[1][:]
        pre_log_std = _dot(h, head_refs[2][:]) + head_refs[3][:]
        values_ref[:] = _dot(h, head_refs[4][:]) + head_refs[5][:]
        actions, logp = sample_continuous_actions(
            mean, pre_log_std, deterministic, squashed
        )
        actions_ref[:] = actions
        logp_ref[:] = logp


def fused_rnn_act(
    model: Any,
    params: Any,
    obs: jax.Array,
    states: Any,
    key: jax.Array,
    *,
    deterministic: bool = False,
    squashed: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, Any]:
    """One recurrent rollout step with a single fused kernel.

    Args:
        obs: ``[B, d_in]`` observations for this step.
        states: ``{hidden_states, cell_states}: [B, K, H]`` pytree
            (``K`` = ``model.num_layers``).

    Returns:
        ``(actions, logp [B, 1], values [B, 1], new_states)``.

    """
    from .fused_rnn_ppo import _concat_lstm_params, _head_layout, _head_params

    K = model.num_layers
    lstm_params = _concat_lstm_params(params, K)
    H = lstm_params[1].shape[0]
    bsz0 = states[DataKeys.HIDDEN_STATES].shape[0]
    h0 = states[DataKeys.HIDDEN_STATES].reshape(bsz0, K * H)
    c0 = states[DataKeys.CELL_STATES].reshape(bsz0, K * H)

    head_names, action_meta, kind = _head_layout(model)
    action_dim = action_meta[0]
    action_dtype = jnp.int32 if kind == "discrete" else jnp.float32
    heads = _head_params(params, head_names)

    # Widen narrow-float observations exactly like the fused update
    # path's packed-row transport (``ops/packing.py``), so both kernels
    # consume identical f32 inputs.
    if obs.dtype != jnp.float32:
        obs = obs.astype(jnp.float32)
    bsz = obs.shape[0]
    # Footprint-aware row tile (cf. fused_mlp._chain_tile): the four
    # [tile, K*H] state blocks dominate and are double-buffered by the
    # Pallas pipeline; per-layer gate transients add ~8H per row, and
    # the head phase holds ~6 copies of the head-output row (logits /
    # log-softmax / Gumbel scores / uniform draws for wide discrete
    # heads; mean / log_std chains for continuous). Deep, wide, or
    # large-action-space configs shrink the tile instead of
    # overshooting vmem_limit_bytes; the default config (K=1, H=256)
    # still gets the full 2048 rows.
    from .fused_mlp import _VMEM_TOTAL_BUDGET

    resident = 4 * sum(int(p.size) for p in (*lstm_params, *heads))
    head_out = sum(int(b.shape[-1]) for b in heads[1::2])
    row_bytes = 4 * (
        2 * (obs.shape[1] + 4 * K * H + action_dim + 2)
        + 8 * H
        + 6 * head_out
    )
    budget = max(4 * 1024 * 1024, _VMEM_TOTAL_BUDGET - resident)
    tile = max(8, min(2048, budget // row_bytes // 8 * 8))
    tile = min(tile, -(-bsz // 8) * 8)
    grid = (pl.cdiv(bsz, tile),)
    seed = key_to_seed(key)

    full = lambda p: pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    row = lambda width: pl.BlockSpec(
        (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    actions, logp, values, h_n, c_n = pl.pallas_call(
        functools.partial(
            _kernel, (H, K, kind, action_meta, deterministic, squashed)
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row(obs.shape[1]),
            row(K * H),
            row(K * H),
            *[full(p) for p in lstm_params],
            *[full(p) for p in heads],
        ],
        out_specs=[
            row(action_dim),
            row(1),
            row(1),
            row(K * H),
            row(K * H),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, action_dim), action_dtype),
            jax.ShapeDtypeStruct((bsz, 1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, K * H), jnp.float32),
            jax.ShapeDtypeStruct((bsz, K * H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seed, obs, h0, c0, *lstm_params, *heads)
    new_states = {
        DataKeys.HIDDEN_STATES: h_n.reshape(bsz, K, H),
        DataKeys.CELL_STATES: c_n.reshape(bsz, K, H),
    }
    return actions, logp, values, new_states
