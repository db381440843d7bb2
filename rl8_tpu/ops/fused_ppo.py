"""Fully-fused PPO minibatch gradient kernel.

One Pallas kernel computes, per minibatch: the default model's forward
(twin activation-MLP chains), the action distribution's log-probs and
entropy, the PPO losses (``/root/reference/src/rl8/nn/functional.py:
259-363`` semantics: dual-clipped surrogate, clamped smooth-L1 value
loss, entropy bonus), their hand-derived backward, and the parameter-
gradient accumulation — entirely in VMEM, reading only the packed
minibatch matrix (see ``rl8_tpu/ops/packing.py``) and the parameters,
and writing only the parameter gradients plus an 8-lane loss-stat
vector. This eliminates every ``[N, ...]`` intermediate the XLA autodiff
path materializes in HBM (activations, relu masks, ratio chains), which
dominates the PPO step cost for small policies.

Supported: :class:`~rl8_tpu.models.DefaultDiscreteModel` with the
:class:`~rl8_tpu.distributions.Categorical` distribution and
:class:`~rl8_tpu.models.DefaultContinuousModel` with
:class:`~rl8_tpu.distributions.Normal`. Everything else falls back to
the flax + ``jax.grad`` path in the algorithm.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data import DataKeys
from .fused_mlp import (
    _chain_sizes,
    _chains_backward,
    _flatten_params,
    _forward_block,
    _make_acc,
    _row_mask,
)

from .distmath import log_softmax_rows, normal_per_dim_logp, squashed_normal_logp

__all__ = ["fused_ppo_grads", "supports_fused_update", "PPOLossConfig"]


@dataclass(frozen=True)
class PPOLossConfig:
    """Static PPO loss hyperparameters (mirrors the subset of
    ``AlgorithmHparams`` the loss consumes)."""

    clip_param: float
    vf_clip_param: float
    vf_coeff: float
    dual_clip_param: None | float
    n_rows: int  # logical minibatch rows
    accum: int  # gradient-accumulation divisor for the total loss
    use_entropy: bool
    #: Squash continuous actions through tanh (SquashedNormal): log-probs
    #: invert via clamped atanh with the +-100 logp clamp
    #: (``distributions.py:147-170``). Requires ``use_entropy=False``.
    squashed: bool = False


def supports_fused_update(
    model: Any, distribution_cls: Any, *, zero_entropy: bool = False
) -> bool:
    """Whether the fully-fused update kernel can evaluate this
    model/distribution pair. SquashedNormal has no defined entropy, so it
    is supported only when the entropy bonus is statically absent."""
    from ..distributions import Categorical, Normal, SquashedNormal
    from ..models import DefaultContinuousModel, DefaultDiscreteModel
    from .fused_mlp import supports_fused_apply

    if not supports_fused_apply(model):
        return False
    if type(model) is DefaultDiscreteModel:
        return distribution_cls is Categorical
    if type(model) is DefaultContinuousModel:
        if distribution_cls is Normal:
            return True
        return distribution_cls is SquashedNormal and zero_entropy
    return False


def _policy_grad_terms(
    new_logp: jax.Array,
    old_logp: jax.Array,
    adv: jax.Array,
    cfg: PPOLossConfig,
    scale: float,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Shared surrogate-loss pieces: per-row policy-loss elements, the
    upstream cotangent on ``new_logp``, and per-row KL elements."""
    lr = new_logp - old_logp
    r = jnp.exp(lr)
    c = cfg.clip_param
    rc = jnp.clip(r, 1.0 - c, 1.0 + c)
    surr1 = adv * r
    surr2 = adv * rc
    clip1 = jnp.minimum(surr1, surr2)
    take1 = surr1 <= surr2
    in_clip = (r > 1.0 - c) & (r < 1.0 + c)
    dclip1_dr = jnp.where(take1, adv, jnp.where(in_clip, adv, 0.0))
    if cfg.dual_clip_param:
        clip2 = jnp.maximum(clip1, cfg.dual_clip_param * adv)
        pol_elem = jnp.where(adv < 0.0, clip2, clip1)
        delem_dr = jnp.where(
            adv < 0.0,
            jnp.where(clip1 >= cfg.dual_clip_param * adv, dclip1_dr, 0.0),
            dclip1_dr,
        )
    else:
        pol_elem = clip1
        delem_dr = dclip1_dr
    # total includes ``- policy_loss`` (policy term is maximized).
    u_pol = -scale * delem_dr * r
    kl_elem = (r - 1.0) - lr
    return pol_elem, u_pol, kl_elem, r


def _vf_grad_terms(
    values: jax.Array, returns: jax.Array, cfg: PPOLossConfig, scale: float
) -> tuple[jax.Array, jax.Array]:
    """Clamped smooth-L1 value loss elements and d(loss)/d(values).

    Boundary convention: the gradient is zeroed with strict comparisons
    (``sl1 < vf_clip_param`` here; strict clip-interval bounds in
    :func:`_policy_grad_terms`), whereas torch's ``clamp`` passes gradient
    at the boundary inclusively. The discrepancy is measure-zero on real
    data and only visible when diffing against an autodiff path at
    hand-picked boundary inputs.
    """
    d = values - returns
    ad = jnp.abs(d)
    sl1 = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
    vf_elem = jnp.clip(sl1, 0.0, cfg.vf_clip_param)
    dsl1 = jnp.where(ad < 1.0, d, jnp.sign(d))
    dv = jnp.where(sl1 < cfg.vf_clip_param, dsl1, 0.0) * (cfg.vf_coeff * scale)
    return vf_elem, dv


def _discrete_kernel(
    sizes, activation, n_params, cfg: PPOLossConfig, cols, action_n,
    packed_ref, ec_ref, *refs,
):
    """Fused PPO grad for DefaultDiscreteModel + Categorical."""
    params = refs[:n_params]
    head_wt_refs = refs[n_params : n_params + 2]
    dparam_refs = refs[n_params + 2 : n_params + 2 + n_params]
    stats_ref = refs[n_params + 2 + n_params]
    acc = _make_acc()

    tile = packed_ref.shape[0]
    valid = _row_mask(cfg.n_rows, tile)
    packed = packed_ref[:]
    obs_sl, act_sl, logp_sl, adv_sl, ret_sl = cols
    x = pltpu.bitcast(packed[:, obs_sl[0] : obs_sl[1]], jnp.float32)
    actions = packed[:, act_sl[0] : act_sl[1]]
    old_logp = pltpu.bitcast(packed[:, logp_sl : logp_sl + 1], jnp.float32)
    adv = pltpu.bitcast(packed[:, adv_sl : adv_sl + 1], jnp.float32)
    ret = pltpu.bitcast(packed[:, ret_sl : ret_sl + 1], jnp.float32)
    if valid is not None:
        x = jnp.where(valid, x, 0.0)
        old_logp = jnp.where(valid, old_logp, 0.0)
        adv = jnp.where(valid, adv, 0.0)
        ret = jnp.where(valid, ret, 0.0)
        actions = jnp.where(valid, actions, 0)

    all_hs, all_aux, all_outs = _forward_block(x, params, sizes, activation)
    logits = all_outs[0][0]  # [tile, A * n]
    values = all_outs[1][0]  # [tile, 1]

    n = action_n
    n_groups = logits.shape[1] // n
    scale = 1.0 / (cfg.n_rows * cfg.accum)
    ec = ec_ref[0, 0]

    # Per-group categorical log-softmax, chosen logp, entropy.
    new_logp = None
    group_data = []
    ent_sum_rows = None
    for a in range(n_groups):
        logp_all = log_softmax_rows(logits[:, a * n : (a + 1) * n])
        p = jnp.exp(logp_all)
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
            == actions[:, a : a + 1]
        )
        chosen = jnp.sum(jnp.where(oh, logp_all, 0.0), axis=1, keepdims=True)
        new_logp = chosen if new_logp is None else new_logp + chosen
        if cfg.use_entropy:
            h_a = -jnp.sum(p * logp_all, axis=1, keepdims=True)
            ent_sum_rows = h_a if ent_sum_rows is None else ent_sum_rows + h_a
        else:
            h_a = None
        group_data.append((p, logp_all, oh, h_a))

    pol_elem, u_pol, kl_elem, _ = _policy_grad_terms(
        new_logp, old_logp, adv, cfg, scale
    )
    vf_elem, dv = _vf_grad_terms(values, ret, cfg, scale)
    if valid is not None:
        pol_elem = jnp.where(valid, pol_elem, 0.0)
        u_pol = jnp.where(valid, u_pol, 0.0)
        kl_elem = jnp.where(valid, kl_elem, 0.0)
        vf_elem = jnp.where(valid, vf_elem, 0.0)
        dv = jnp.where(valid, dv, 0.0)

    dz_groups = []
    for p, logp_all, oh, h_a in group_data:
        dz = u_pol * (jnp.where(oh, 1.0, 0.0) - p)
        if cfg.use_entropy:
            # total includes ``- ec * mean(H)``; dH/dz = -p (logp + H).
            dz = dz + (ec * scale) * p * (logp_all + h_a)
        if valid is not None:
            dz = jnp.where(valid, dz, 0.0)
        dz_groups.append(dz)
    dlogits = dz_groups[0] if n_groups == 1 else jnp.concatenate(dz_groups, axis=1)

    _chains_backward(
        sizes, activation, params, head_wt_refs, all_hs, all_aux,
        [[dlogits], [dv]], dparam_refs, acc, need_dx=False,
    )

    if cfg.use_entropy and ent_sum_rows is not None:
        ent_total = jnp.sum(
            jnp.where(valid, ent_sum_rows, 0.0)
            if valid is not None
            else ent_sum_rows
        )
    else:
        ent_total = jnp.zeros((), jnp.float32)
    zero = jnp.zeros((1, 1), jnp.float32)
    stats = jnp.concatenate(
        [
            jnp.sum(pol_elem).reshape(1, 1),
            jnp.sum(vf_elem).reshape(1, 1),
            ent_total.reshape(1, 1),
            jnp.sum(kl_elem).reshape(1, 1),
            zero,
            zero,
            zero,
            zero,
        ],
        axis=1,
    )
    acc(stats_ref, stats)


def _continuous_kernel(
    sizes, activation, n_params, cfg: PPOLossConfig, cols,
    packed_ref, ec_ref, *refs,
):
    """Fused PPO grad for DefaultContinuousModel + Normal.

    Chain 0 has two heads (mean, pre-tanh log_std); the model applies
    ``tanh`` to the log_std head (``models/_feedforward.py:191``), so the
    backward chains through it.
    """
    params = refs[:n_params]
    head_wt_refs = refs[n_params : n_params + 3]
    dparam_refs = refs[n_params + 3 : n_params + 3 + n_params]
    stats_ref = refs[n_params + 3 + n_params]
    acc = _make_acc()

    tile = packed_ref.shape[0]
    valid = _row_mask(cfg.n_rows, tile)
    packed = packed_ref[:]
    obs_sl, act_sl, logp_sl, adv_sl, ret_sl = cols
    x = pltpu.bitcast(packed[:, obs_sl[0] : obs_sl[1]], jnp.float32)
    actions = pltpu.bitcast(packed[:, act_sl[0] : act_sl[1]], jnp.float32)
    old_logp = pltpu.bitcast(packed[:, logp_sl : logp_sl + 1], jnp.float32)
    adv = pltpu.bitcast(packed[:, adv_sl : adv_sl + 1], jnp.float32)
    ret = pltpu.bitcast(packed[:, ret_sl : ret_sl + 1], jnp.float32)
    if valid is not None:
        x = jnp.where(valid, x, 0.0)
        actions = jnp.where(valid, actions, 0.0)
        old_logp = jnp.where(valid, old_logp, 0.0)
        adv = jnp.where(valid, adv, 0.0)
        ret = jnp.where(valid, ret, 0.0)

    all_hs, all_aux, all_outs = _forward_block(x, params, sizes, activation)
    mean, pre_log_std = all_outs[0]
    values = all_outs[1][0]
    log_std = jnp.tanh(pre_log_std)
    inv_var = jnp.exp(-2.0 * log_std)

    if cfg.squashed:
        # SquashedNormal (shared in-kernel math: ``ops/distmath.py``);
        # the +-100 clamp also gates the mean/log_std gradients.
        new_logp, diff, grad_gate = squashed_normal_logp(
            actions, mean, log_std, inv_var
        )
    else:
        diff = actions - mean
        grad_gate = None
        new_logp = jnp.sum(
            normal_per_dim_logp(diff, log_std, inv_var), axis=1, keepdims=True
        )

    scale = 1.0 / (cfg.n_rows * cfg.accum)
    ec = ec_ref[0, 0]
    pol_elem, u_pol, kl_elem, _ = _policy_grad_terms(
        new_logp, old_logp, adv, cfg, scale
    )
    vf_elem, dv = _vf_grad_terms(values, ret, cfg, scale)

    # d new_logp/d mean = diff * inv_var; d/d log_std = diff^2*inv_var - 1.
    dmean = u_pol * (diff * inv_var)
    dlog_std = u_pol * (diff * diff * inv_var - 1.0)
    if grad_gate is not None:
        dmean = dmean * grad_gate
        dlog_std = dlog_std * grad_gate
    if cfg.use_entropy:
        from .distmath import LOG_2PI

        # H = sum(0.5 (1 + log 2pi) + log_std); total has -ec*mean(H).
        ent_rows = jnp.sum(
            0.5 * (1.0 + LOG_2PI) + log_std, axis=1, keepdims=True
        )
        dlog_std = dlog_std - (ec * scale)
    else:
        ent_rows = None
    dpre_log_std = dlog_std * (1.0 - log_std * log_std)
    if valid is not None:
        pol_elem = jnp.where(valid, pol_elem, 0.0)
        kl_elem = jnp.where(valid, kl_elem, 0.0)
        vf_elem = jnp.where(valid, vf_elem, 0.0)
        dv = jnp.where(valid, dv, 0.0)
        dmean = jnp.where(valid, dmean, 0.0)
        dpre_log_std = jnp.where(valid, dpre_log_std, 0.0)

    _chains_backward(
        sizes, activation, params, head_wt_refs, all_hs, all_aux,
        [[dmean, dpre_log_std], [dv]], dparam_refs, acc, need_dx=False,
    )

    if cfg.use_entropy and ent_rows is not None:
        if valid is not None:
            ent_rows = jnp.where(valid, ent_rows, 0.0)
        ent_total = jnp.sum(ent_rows)
    else:
        ent_total = jnp.zeros((), jnp.float32)
    zero = jnp.zeros((1, 1), jnp.float32)
    stats = jnp.concatenate(
        [
            jnp.sum(pol_elem).reshape(1, 1),
            jnp.sum(vf_elem).reshape(1, 1),
            ent_total.reshape(1, 1),
            jnp.sum(kl_elem).reshape(1, 1),
            zero,
            zero,
            zero,
            zero,
        ],
        axis=1,
    )
    acc(stats_ref, stats)


def fused_ppo_grads(
    model: Any,
    params: Any,
    packed_mb: jax.Array,
    unpacker: Any,
    entropy_coeff: jax.Array | float,
    cfg: PPOLossConfig,
    *,
    interpret: bool = False,
) -> tuple[dict[str, jax.Array], jax.Array, Any]:
    """Compute PPO losses, approximate KL, and parameter gradients for one
    packed minibatch with the fused kernel.

    Equivalent (to matmul precision) to differentiating
    ``ppo_losses(...)["total"] / accum`` through the flax model.

    Args:
        model: A supported default model (see :func:`supports_fused_update`).
        params: The model's flax parameter dict.
        packed_mb: ``[rows, D]`` int32 matrix from :func:`pack_rows` over
            the standard flat training batch.
        unpacker: The matching :class:`RowUnpacker` (for column layout).
        entropy_coeff: Dynamic entropy coefficient scalar.
        cfg: Static loss hyperparameters.

    Returns:
        ``(losses, kl, grads)`` where ``losses`` has the ``ppo_losses``
        keys (per-minibatch means), ``kl`` is the mean approximate KL,
        and ``grads`` matches the ``params`` tree.

    """
    from ..models import DefaultContinuousModel, DefaultDiscreteModel

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

    obs_sl = _cols(idx[DataKeys.VIEWS][DataKeys.OBS])
    act_sl = _cols(idx[DataKeys.ACTIONS])
    logp_sl = _cols(idx[DataKeys.LOGP])[0]
    adv_sl = _cols(idx[DataKeys.ADVANTAGES])[0]
    ret_sl = _cols(idx[DataKeys.RETURNS])[0]
    cols = (obs_sl, act_sl, logp_sl, adv_sl, ret_sl)

    from .fused_mlp import _default_chain_names, _default_chains

    discrete = type(model) is DefaultDiscreteModel
    chains = _default_chains(model, params)
    names = _default_chain_names(model)

    flat = _flatten_params(chains)
    flat_head_wts = [w.T for _, heads in chains for w, _ in heads]
    if discrete:
        kernel = functools.partial(
            _discrete_kernel, _chain_sizes(chains), model.activation_fn,
            len(flat), cfg, cols, model.action_spec.n,
        )
    else:
        kernel = functools.partial(
            _continuous_kernel, _chain_sizes(chains), model.activation_fn,
            len(flat), cfg, cols,
        )

    rows = packed_mb.shape[0]
    # The update kernel's live set adds loss/sampling buffers on top of
    # the chain activations; double the chain estimate to cover them.
    from .fused_mlp import _chain_tile

    tile = _chain_tile(rows, chains, extra_row_factor=2)
    grid = (pl.cdiv(rows, tile),)
    ec = jnp.asarray(entropy_coeff, dtype=jnp.float32).reshape(1, 1)

    dparam_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat]
    out_shapes = [*dparam_shapes, jax.ShapeDtypeStruct((1, 8), jnp.float32)]
    param_specs = [
        pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for p in flat
    ]
    head_wt_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in flat_head_wts
    ]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile, packed_mb.shape[1]), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            *param_specs,
            *head_wt_specs,
        ],
        out_specs=[
            *param_specs,
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(packed_mb, ec, *flat, *flat_head_wts)

    dflat = outs[:-1]
    stats = outs[-1][0]
    n = float(cfg.n_rows)
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

    # Rebuild the params-tree gradient from the flat chain layout.
    grads: dict[str, Any] = {}
    r = 0
    for (torso_name, head_names), (layers, heads) in zip(names, chains):
        torso: dict[str, Any] = {}
        for li in range(len(layers)):
            w, b = layers[li]
            torso[f"Dense_{li}"] = {
                "kernel": dflat[r].astype(w.dtype),
                "bias": dflat[r + 1].reshape(b.shape).astype(b.dtype),
            }
            r += 2
        grads[torso_name] = torso
        for hn, (w, b) in zip(head_names, heads):
            grads[hn] = {
                "kernel": dflat[r].astype(w.dtype),
                "bias": dflat[r + 1].reshape(b.shape).astype(b.dtype),
            }
            r += 2
    return losses, kl, grads
