"""Fully-fused recurrent (LSTM) PPO minibatch gradient kernel.

The recurrent update is the slowest path in the framework under XLA:
truncated-BPTT autodiff over ``[N, seq_len]`` sequence minibatches
materializes per-timestep LSTM activations in HBM and runs ~6% MXU
utilization. This kernel computes — per minibatch tile, entirely in
VMEM — the stacked-LSTM forward over the sequence (exactly flax's
``OptimizedLSTMCell`` math per layer: sigmoid i/f/o gates, tanh g,
``c' = f c + i g``, ``h' = o tanh(c')``), the per-step policy/value
heads, the PPO losses for every (sequence, step) sample, and the
hand-derived BPTT backward — including the inter-layer ``dx`` chain —
writing only the parameter gradients and loss-stat sums.

Counterpart semantics: ``/root/reference/src/rl8/algorithms/
_recurrent.py:481-652`` (sequence minibatches whose stored initial
states seed the forward; each of the ``N x seq_len`` samples enters the
loss with equal weight).

Supported: ``DefaultDiscreteRecurrentModel`` + ``Categorical`` and
``DefaultContinuousRecurrentModel`` + ``Normal``/``SquashedNormal``
(zero entropy), stacked LSTMs up to 8 layers; everything else falls
back to the flax autodiff path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data import DataKeys
from .distmath import LOG_2PI, log_softmax_rows, normal_per_dim_logp, squashed_normal_logp
from .fused_mlp import _dot, _dot_bt, _dot_t, _make_acc, _row_mask
from .fused_ppo import PPOLossConfig, _policy_grad_terms, _vf_grad_terms

__all__ = ["fused_rnn_ppo_grads", "supports_fused_rnn_update"]

_GATES = ("i", "f", "g", "o")


def _concat_lstm_params(params: Any, num_layers: int) -> list:
    """Per-layer ``(Wi, Wh, bias)`` with the four gates concatenated in
    flax's i,f,g,o order — the parameter layout BOTH recurrent kernels
    index. Shared so the act kernel's log-probs stay bit-compatible with
    the update kernel's (the PPO ratio divides one by the other)."""
    out = []
    for l in range(num_layers):
        cell = params["lstm"][f"lstm_{l}"]
        out.append(
            jnp.concatenate([cell[f"i{g}"]["kernel"] for g in _GATES], axis=1)
        )
        out.append(
            jnp.concatenate([cell[f"h{g}"]["kernel"] for g in _GATES], axis=1)
        )
        out.append(
            jnp.concatenate(
                [cell[f"h{g}"]["bias"] for g in _GATES]
            ).reshape(1, -1)
        )
    return out


def _head_layout(model: Any) -> tuple[tuple[str, ...], tuple[int, ...], str]:
    """``(head param names, action metadata, kind)`` for a supported
    default recurrent model — the other half of the shared layout
    contract (see :func:`_concat_lstm_params`)."""
    from ..models import DefaultDiscreteRecurrentModel

    if type(model) is DefaultDiscreteRecurrentModel:
        return (
            ("feature_head", "vf_head"),
            (model.action_spec.shape[0], model.action_spec.n),
            "discrete",
        )
    return (
        ("action_mean", "action_log_std", "vf_model"),
        (model.action_spec.shape[0],),
        "continuous",
    )


def _head_params(params: Any, head_names: tuple[str, ...]) -> list:
    heads = []
    for name in head_names:
        heads.append(params[name]["kernel"])
        heads.append(params[name]["bias"].reshape(1, -1))
    return heads


def supports_fused_rnn_update(
    model: Any, distribution_cls: Any, *, zero_entropy: bool = False
) -> bool:
    """Whether the fused recurrent update kernel can evaluate this
    model/distribution pair.

    Like :func:`rl8_tpu.ops.fused_mlp.supports_fused_apply`, models with
    an explicit compute ``dtype`` (set by ``enable_amp``) are excluded:
    the kernels run their own fixed precision scheme, which would
    silently bypass the requested AMP dtype.
    """
    from ..distributions import Categorical, Normal, SquashedNormal
    from ..models import (
        DefaultContinuousRecurrentModel,
        DefaultDiscreteRecurrentModel,
    )

    if type(model) is DefaultDiscreteRecurrentModel:
        ok = distribution_cls is Categorical
    elif type(model) is DefaultContinuousRecurrentModel:
        ok = distribution_cls is Normal or (
            distribution_cls is SquashedNormal and zero_entropy
        )
    else:
        return False
    if model.dtype is not None:
        return False
    if not (ok and 1 <= model.num_layers <= 8 and bool(model.bias)):
        return False
    # The packed-row transport bitcasts observation columns back as f32
    # (``ops/packing.py``), which is only meaningful for float
    # observations — int/bool bit patterns would reinterpret as denormal
    # garbage (same gate as ``fused_mlp.supports_fused_apply``).
    if not jnp.issubdtype(
        jnp.dtype(model.observation_spec.dtype), jnp.floating
    ):
        return False
    # Weight-residency gate, mirroring fused_mlp.chains_fit_vmem: the
    # update kernel holds every LSTM *and head* parameter, its gradient
    # accumulator, AND the pre-transposed head weights in VMEM, so very
    # wide cells (H >= ~2048) or very wide heads (large-vocabulary
    # action spaces) must fall back to autodiff instead of failing
    # Mosaic allocation.
    from .fused_mlp import _VMEM_TOTAL_BUDGET

    H, L = model.hidden_size, model.num_layers
    d0 = int(model.observation_spec.shape[0])
    lstm_f32s = 4 * H * (d0 + H + 1) + (L - 1) * 4 * H * (2 * H + 1)
    A = int(model.action_spec.shape[0])
    if type(model) is DefaultDiscreteRecurrentModel:
        head_out = A * int(model.action_spec.n) + 1  # logits + value
    else:
        head_out = 2 * A + 1  # mean + log_std + value
    head_w_f32s = H * head_out
    head_f32s = head_w_f32s + head_out  # weights + biases
    resident = 2 * (lstm_f32s + head_f32s) + head_w_f32s  # + transposes
    return 4 * resident <= _VMEM_TOTAL_BUDGET - 8 * 1024 * 1024


def _rnn_tile(
    n: int,
    hidden: int,
    seq_len: int,
    num_layers: int,
    resident_bytes: int = 0,
) -> int:
    """Row-tile size bounded by the BPTT saves: the backward holds ~8
    f32 ``[tile, H]`` tensors per (timestep, layer) in VMEM, so the tile
    shrinks with ``hidden * seq_len * num_layers`` to stay within the
    kernel's VMEM budget for any supported config. ``resident_bytes``
    (parameters + gradient accumulators + transposed head weights, all
    grid-invariant) is charged against the total budget first —
    mirroring ``fused_mlp._chain_tile`` — so mid-width stacks that pass
    the weight-residency gate shrink their saves instead of overshooting
    ``vmem_limit_bytes``.

    The 2-layer default config additionally caps the tile at 256:
    measured on a v5e (H=256, seq_len=4, default recurrent config) the
    VMEM-budget tile of 512 holds ~34MB of BPTT saves and loses
    pipelining headroom — 62.9 ms/iter vs 58.4 ms at 256 (+7.6%
    throughput). One layer is insensitive (26.4 ms either way, ~17MB of
    saves) and 4+ layers already shrink below 256 ... 384, where the
    extra grid steps outweigh the headroom (tile 384: 122.7 ms vs 256:
    125.2 ms), so the cap applies to exactly the 2-layer case.
    """
    from .fused_mlp import _VMEM_TOTAL_BUDGET

    # Saves get at most the measured 48MB sweet spot, less whatever the
    # residents eat out of the total budget (gates/douts transients ride
    # the total-vs-limit slack).
    budget = max(
        4 * 1024 * 1024,
        min(48 * 1024 * 1024, _VMEM_TOTAL_BUDGET - resident_bytes),
    )
    per_row = 8 * 4 * hidden * seq_len * num_layers
    cap = 256 if num_layers == 2 else 512
    tile = max(8, min(cap, (budget // max(per_row, 1)) // 8 * 8))
    return min(tile, -(-n // 8) * 8)


def _kernel(
    cfg: PPOLossConfig,
    cols,
    dims,  # (d_in, H, L, K, kind, action_meta)
    packed_ref,
    ec_ref,
    *refs,
):
    d_in, H, L, K, kind, action_meta = dims
    # Ref layout: per-layer (wi, wh, b) x K, then head params, then
    # transposed head weights; outputs mirror the parameter layout.
    n_heads = 3 if kind != "discrete" else 2
    lstm_refs = refs[: 3 * K]
    head_refs = refs[3 * K : 3 * K + 2 * n_heads]
    head_wt_refs = refs[3 * K + 2 * n_heads : 3 * K + 3 * n_heads]
    out = refs[3 * K + 3 * n_heads :]
    dlstm_refs = out[: 3 * K]
    dhead_refs = out[3 * K : 3 * K + 2 * n_heads]
    stats_ref = out[3 * K + 2 * n_heads]

    tile = packed_ref.shape[0]
    valid = _row_mask(cfg.n_rows, tile)
    packed = packed_ref[:]
    obs_sl, h_sl, c_sl, act_sl, logp_sl, adv_sl, ret_sl = cols

    def fcols(sl) -> jax.Array:
        return pltpu.bitcast(packed[:, sl[0] : sl[1]], jnp.float32)

    obs = fcols(obs_sl)  # [tile, L * d_in]
    h_cols = fcols(h_sl)  # [tile, K * H]
    c_cols = fcols(c_sl)
    logp_all = fcols(logp_sl)  # [tile, L]
    adv_all = fcols(adv_sl)
    ret_all = fcols(ret_sl)
    if kind == "discrete":
        actions = packed[:, act_sl[0] : act_sl[1]]  # int32 [tile, L * A]
    else:
        actions = fcols(act_sl)
    if valid is not None:
        obs = jnp.where(valid, obs, 0.0)
        h_cols = jnp.where(valid, h_cols, 0.0)
        c_cols = jnp.where(valid, c_cols, 0.0)
        logp_all = jnp.where(valid, logp_all, 0.0)
        adv_all = jnp.where(valid, adv_all, 0.0)
        ret_all = jnp.where(valid, ret_all, 0.0)
        actions = jnp.where(valid, actions, 0 if kind == "discrete" else 0.0)

    wi = [lstm_refs[3 * l][:] for l in range(K)]
    wh = [lstm_refs[3 * l + 1][:] for l in range(K)]
    b = [lstm_refs[3 * l + 2][:] for l in range(K)]
    hs = [h_cols[:, l * H : (l + 1) * H] for l in range(K)]
    cs = [c_cols[:, l * H : (l + 1) * H] for l in range(K)]
    ec = ec_ref[0, 0]
    scale = 1.0 / (cfg.n_rows * L * cfg.accum)

    # ---------------- forward: LSTM + heads + per-step loss -----------
    saves = []
    douts = []  # per step: tuple of head cotangents
    pol_sum = jnp.zeros((), jnp.float32)
    vf_sum = jnp.zeros((), jnp.float32)
    ent_sum = jnp.zeros((), jnp.float32)
    kl_sum = jnp.zeros((), jnp.float32)
    for t in range(L):
        x = obs[:, t * d_in : (t + 1) * d_in]
        layer_saves = []
        for l in range(K):
            z = _dot(x, wi[l]) + _dot(hs[l], wh[l]) + b[l]
            gi = jax.nn.sigmoid(z[:, 0:H])
            gf = jax.nn.sigmoid(z[:, H : 2 * H])
            gg = jnp.tanh(z[:, 2 * H : 3 * H])
            go = jax.nn.sigmoid(z[:, 3 * H : 4 * H])
            c_new = gf * cs[l] + gi * gg
            tc = jnp.tanh(c_new)
            layer_saves.append((x, hs[l], cs[l], gi, gf, gg, go, tc))
            hs[l], cs[l] = go * tc, c_new
            x = hs[l]  # the layer above consumes this layer's output
        saves.append(layer_saves)
        h = hs[-1]

        old_logp = logp_all[:, t : t + 1]
        adv = adv_all[:, t : t + 1]
        ret = ret_all[:, t : t + 1]
        if kind == "discrete":
            A, n = action_meta
            w_pi, b_pi = head_refs[0][:], head_refs[1][:]
            w_v, b_v = head_refs[2][:], head_refs[3][:]
            logits = _dot(h, w_pi) + b_pi
            values = _dot(h, w_v) + b_v
            acts_t = actions[:, t * A : (t + 1) * A]
            new_logp = None
            group_data = []
            ent_rows = None
            for a in range(A):
                lp = log_softmax_rows(logits[:, a * n : (a + 1) * n])
                p = jnp.exp(lp)
                oh = (
                    jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
                    == acts_t[:, a : a + 1]
                )
                chosen = jnp.sum(jnp.where(oh, lp, 0.0), axis=1, keepdims=True)
                new_logp = chosen if new_logp is None else new_logp + chosen
                if cfg.use_entropy:
                    h_a = -jnp.sum(p * lp, axis=1, keepdims=True)
                    ent_rows = h_a if ent_rows is None else ent_rows + h_a
                else:
                    h_a = None
                group_data.append((p, lp, oh, h_a))
            pol_elem, u_pol, kl_elem, _ = _policy_grad_terms(
                new_logp, old_logp, adv, cfg, scale
            )
            vf_elem, dv = _vf_grad_terms(values, ret, cfg, scale)
            dz_groups = []
            for p, lp, oh, h_a in group_data:
                dz_g = u_pol * (jnp.where(oh, 1.0, 0.0) - p)
                if cfg.use_entropy:
                    dz_g = dz_g + (ec * scale) * p * (lp + h_a)
                dz_groups.append(dz_g)
            dlogits = (
                dz_groups[0] if A == 1 else jnp.concatenate(dz_groups, axis=1)
            )
            if valid is not None:
                dlogits = jnp.where(valid, dlogits, 0.0)
                dv = jnp.where(valid, dv, 0.0)
                pol_elem = jnp.where(valid, pol_elem, 0.0)
                vf_elem = jnp.where(valid, vf_elem, 0.0)
                kl_elem = jnp.where(valid, kl_elem, 0.0)
                if ent_rows is not None:
                    ent_rows = jnp.where(valid, ent_rows, 0.0)
            douts.append((dlogits, dv))
        else:
            A = action_meta[0]
            w_mu, b_mu = head_refs[0][:], head_refs[1][:]
            w_ls, b_ls = head_refs[2][:], head_refs[3][:]
            w_v, b_v = head_refs[4][:], head_refs[5][:]
            mean = _dot(h, w_mu) + b_mu
            pre_log_std = _dot(h, w_ls) + b_ls
            values = _dot(h, w_v) + b_v
            log_std = jnp.tanh(pre_log_std)
            inv_var = jnp.exp(-2.0 * log_std)
            acts_t = actions[:, t * A : (t + 1) * A]
            if cfg.squashed:
                new_logp, diff, grad_gate = squashed_normal_logp(
                    acts_t, mean, log_std, inv_var
                )
            else:
                diff = acts_t - mean
                grad_gate = None
                new_logp = jnp.sum(
                    normal_per_dim_logp(diff, log_std, inv_var),
                    axis=1,
                    keepdims=True,
                )
            pol_elem, u_pol, kl_elem, _ = _policy_grad_terms(
                new_logp, old_logp, adv, cfg, scale
            )
            vf_elem, dv = _vf_grad_terms(values, ret, cfg, scale)
            dmean = u_pol * (diff * inv_var)
            dlog_std = u_pol * (diff * diff * inv_var - 1.0)
            if grad_gate is not None:
                dmean = dmean * grad_gate
                dlog_std = dlog_std * grad_gate
            if cfg.use_entropy:
                ent_rows = jnp.sum(
                    0.5 * (1.0 + LOG_2PI) + log_std, axis=1, keepdims=True
                )
                dlog_std = dlog_std - (ec * scale)
            else:
                ent_rows = None
            dpre_ls = dlog_std * (1.0 - log_std * log_std)
            if valid is not None:
                dmean = jnp.where(valid, dmean, 0.0)
                dpre_ls = jnp.where(valid, dpre_ls, 0.0)
                dv = jnp.where(valid, dv, 0.0)
                pol_elem = jnp.where(valid, pol_elem, 0.0)
                vf_elem = jnp.where(valid, vf_elem, 0.0)
                kl_elem = jnp.where(valid, kl_elem, 0.0)
                if ent_rows is not None:
                    ent_rows = jnp.where(valid, ent_rows, 0.0)
            douts.append((dmean, dpre_ls, dv))
        pol_sum = pol_sum + jnp.sum(pol_elem)
        vf_sum = vf_sum + jnp.sum(vf_elem)
        kl_sum = kl_sum + jnp.sum(kl_elem)
        if cfg.use_entropy and ent_rows is not None:
            ent_sum = ent_sum + jnp.sum(ent_rows)

    # ---------------- backward: heads + stacked BPTT ------------------
    _acc = _make_acc()

    dwi = [None] * K
    dwh = [None] * K
    dbias = [None] * K
    dheads = [None] * (2 * n_heads)
    dh_time = [jnp.zeros((tile, H), jnp.float32) for _ in range(K)]
    dc_time = [jnp.zeros((tile, H), jnp.float32) for _ in range(K)]
    for t in range(L - 1, -1, -1):
        # Head cotangents enter the TOP layer's output at step t.
        _, _, _, _, _, _, go_top, tc_top = saves[t][K - 1]
        h_top = go_top * tc_top
        dh_head = jnp.zeros((tile, H), jnp.float32)
        for j, dout in enumerate(douts[t]):
            dW = _dot_t(h_top, dout)
            db_h = jnp.sum(dout, axis=0, keepdims=True)
            dheads[2 * j] = dW if dheads[2 * j] is None else dheads[2 * j] + dW
            dheads[2 * j + 1] = (
                db_h if dheads[2 * j + 1] is None else dheads[2 * j + 1] + db_h
            )
            dh_head = dh_head + _dot(dout, head_wt_refs[j][:])
        dx_above = None  # cotangent flowing into layer l's output from layer l+1
        for l in range(K - 1, -1, -1):
            x_in, h_prev, c_prev, gi, gf, gg, go, tc = saves[t][l]
            dh = dh_time[l] + (dh_head if l == K - 1 else dx_above)
            dc = dh * go * (1.0 - tc * tc) + dc_time[l]
            do_z = dh * tc * go * (1.0 - go)
            di_z = dc * gg * gi * (1.0 - gi)
            df_z = dc * c_prev * gf * (1.0 - gf)
            dg_z = dc * gi * (1.0 - gg * gg)
            dz = jnp.concatenate([di_z, df_z, dg_z, do_z], axis=1)  # [tile, 4H]
            dwi_t = _dot_t(x_in, dz)
            dwh_t = _dot_t(h_prev, dz)
            db_t = jnp.sum(dz, axis=0, keepdims=True)
            dwi[l] = dwi_t if dwi[l] is None else dwi[l] + dwi_t
            dwh[l] = dwh_t if dwh[l] is None else dwh[l] + dwh_t
            dbias[l] = db_t if dbias[l] is None else dbias[l] + db_t
            dh_time[l] = _dot_bt(dz, wh[l])
            dc_time[l] = dc * gf
            if l > 0:
                dx_above = _dot_bt(dz, wi[l])

    for l in range(K):
        _acc(dlstm_refs[3 * l], dwi[l])
        _acc(dlstm_refs[3 * l + 1], dwh[l])
        _acc(dlstm_refs[3 * l + 2], dbias[l])
    for j in range(2 * n_heads):
        _acc(dhead_refs[j], dheads[j])
    zero = jnp.zeros((1, 1), jnp.float32)
    stats = jnp.concatenate(
        [
            pol_sum.reshape(1, 1),
            vf_sum.reshape(1, 1),
            ent_sum.reshape(1, 1),
            kl_sum.reshape(1, 1),
            zero,
            zero,
            zero,
            zero,
        ],
        axis=1,
    )
    _acc(stats_ref, stats)


def fused_rnn_ppo_grads(
    model: Any,
    params: Any,
    packed_mb: jax.Array,
    unpacker: Any,
    entropy_coeff: jax.Array | float,
    cfg: PPOLossConfig,
    *,
    interpret: bool = False,
) -> tuple[dict[str, jax.Array], jax.Array, Any]:
    """Compute the recurrent PPO losses, approximate KL, and parameter
    gradients for one packed sequence minibatch with the fused kernel.

    ``cfg.n_rows`` counts SEQUENCES (loss terms normalize by
    ``n_rows * seq_len``). Returns ``(losses, kl, grads)`` with
    per-sample-mean losses and a gradient tree matching ``params``.
    """
    from ..models import DefaultDiscreteRecurrentModel

    if cfg.squashed and cfg.use_entropy:
        raise ValueError(
            "SquashedNormal has no defined entropy; the fused update"
            " requires a statically-zero entropy coefficient."
        )
    assert packed_mb.shape[0] == cfg.n_rows, (
        "packed minibatch rows must equal cfg.n_rows — the kernel's"
        " padding mask is keyed on n_rows, so extra pre-padded rows"
        " would be summed into gradients unmasked"
    )
    idx = unpacker.leaf_index_tree()
    metas = unpacker.metas

    def _cols(leaf_idx: int) -> tuple[int, int]:
        m = metas[leaf_idx]
        return (m.start, m.stop)

    cols = (
        _cols(idx[DataKeys.OBS]),
        _cols(idx[DataKeys.STATES][DataKeys.HIDDEN_STATES]),
        _cols(idx[DataKeys.STATES][DataKeys.CELL_STATES]),
        _cols(idx[DataKeys.ACTIONS]),
        _cols(idx[DataKeys.LOGP]),
        _cols(idx[DataKeys.ADVANTAGES]),
        _cols(idx[DataKeys.RETURNS]),
    )

    K = model.num_layers
    lstm_params = _concat_lstm_params(params, K)
    d_in = lstm_params[0].shape[0]
    H = lstm_params[1].shape[0]

    head_names, action_meta, kind = _head_layout(model)
    heads = _head_params(params, head_names)
    head_wts = [params[name]["kernel"].T for name in head_names]

    rows = packed_mb.shape[0]
    # seq_len from the logp column width.
    L = cols[4][1] - cols[4][0]
    # Grid-invariant VMEM residents: every LSTM/head parameter plus its
    # gradient accumulator, plus the pre-transposed head weights.
    resident = 4 * (
        2 * sum(int(p.size) for p in (*lstm_params, *heads))
        + sum(int(w.size) for w in head_wts)
    )
    tile = _rnn_tile(rows, H, L, K, resident_bytes=resident)
    grid = (pl.cdiv(rows, tile),)
    ec = jnp.asarray(entropy_coeff, dtype=jnp.float32).reshape(1, 1)

    full = lambda p: pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    dparam_shapes = [
        *[jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in lstm_params],
        *[jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in heads],
    ]
    out_shapes = [*dparam_shapes, jax.ShapeDtypeStruct((1, 8), jnp.float32)]
    outs = pl.pallas_call(
        functools.partial(
            _kernel, cfg, cols, (d_in, H, L, K, kind, action_meta)
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile, packed_mb.shape[1]), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            *[full(p) for p in lstm_params],
            *[full(p) for p in heads],
            *[full(w) for w in head_wts],
        ],
        out_specs=[
            *[full(p) for p in lstm_params],
            *[full(p) for p in heads],
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(packed_mb, ec, *lstm_params, *heads, *head_wts)

    dlstm = outs[: 3 * K]
    dheads = outs[3 * K : 3 * K + len(heads)]
    stats = outs[-1][0]
    n = float(cfg.n_rows * L)
    policy_loss = stats[0] / n
    vf_loss = stats[1] / n
    entropy_loss = stats[2] / n
    kl = stats[3] / n
    total = cfg.vf_coeff * vf_loss - policy_loss
    if cfg.use_entropy:
        total = total - jnp.asarray(entropy_coeff, jnp.float32) * entropy_loss
    losses = {
        "entropy": entropy_loss,
        "policy": policy_loss,
        "vf": vf_loss,
        "total": total,
    }

    # Rebuild the params-tree gradient: split the fused gate grads.
    lstm_tree: dict[str, Any] = {}
    for l in range(K):
        dwi, dwh, db = dlstm[3 * l], dlstm[3 * l + 1], dlstm[3 * l + 2]
        cell_grads: dict[str, Any] = {}
        for k, g in enumerate(_GATES):
            cell_grads[f"i{g}"] = {"kernel": dwi[:, k * H : (k + 1) * H]}
            cell_grads[f"h{g}"] = {
                "kernel": dwh[:, k * H : (k + 1) * H],
                "bias": db[0, k * H : (k + 1) * H],
            }
        lstm_tree[f"lstm_{l}"] = cell_grads
    grads: dict[str, Any] = {"lstm": lstm_tree}
    for j, name in enumerate(head_names):
        w, bias = params[name]["kernel"], params[name]["bias"]
        grads[name] = {
            "kernel": dheads[2 * j].astype(w.dtype),
            "bias": dheads[2 * j + 1].reshape(bias.shape).astype(bias.dtype),
        }
    return losses, kl, grads
