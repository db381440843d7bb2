"""Fused MLP forward/backward Pallas kernels for the default models.

The PPO update's cost on small MLP policies is dominated by HBM traffic
on ``[N, hidden]`` activations: XLA materializes dozens of 67MB+
intermediate tensors per epoch (relu masks, products, layer outputs) for
the forward and backward passes of the default twin-torso models
(counterparts of ``/root/reference/src/rl8/models/_feedforward.py:
234-383``). These kernels eliminate that traffic: the forward writes
only head outputs, and the backward *recomputes* activations tile-by-tile
in VMEM (inputs are tiny — observation vectors), so HBM traffic is
reduced to reading the inputs and weights and writing the outputs and
weight gradients. Matmuls run on the MXU in bf16 with f32 accumulation,
matching XLA's default-precision dot lowering.

The public entry points are :func:`fused_chains` — a custom-VJP op that
evaluates several head-capped activation-MLP chains sharing one input in
a single kernel launch — and :func:`fused_default_apply`, which maps the
default flax models' parameter trees onto it.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data import DataKeys

__all__ = [
    "fused_chains",
    "fused_default_apply",
    "fused_custom_apply",
    "fused_recurrent_custom_apply",
    "supports_fused_apply",
    "supports_fused_recurrent_apply",
    "FusedApplySpec",
    "FusedRecurrentApplySpec",
]

# Activations with derivatives expressible from the *post*-activation
# value (what the backward pass recomputes).
_ACT_FNS = {
    "relu": lambda x: jnp.maximum(x, 0.0),
    "tanh": jnp.tanh,
}
# Derivatives compute in f32 (Mosaic lacks bf16 compares/ops for these)
# even when the stored post-activations are bf16.
_ACT_GRAD_FROM_OUT = {
    "relu": lambda h: (h.astype(jnp.float32) > 0.0).astype(jnp.float32),
    "tanh": lambda h: 1.0 - jnp.square(h.astype(jnp.float32)),
}



#: Per-grid-step budget for row-tiled VMEM buffers (activations, aux,
#: cotangents). Deliberately well under the ~128MB physical VMEM: the
#: resident parameter/accumulator arrays and Pallas' double-buffering of
#: grid-blocked operands share the same space.
_ROW_BYTES_BUDGET = 48 * 1024 * 1024
#: Total fixed-residents + row-tiled budget the kernels are allowed —
#: matches the ``vmem_limit_bytes=100MB`` compiler param minus headroom
#: for double-buffered grid-blocked operands. The row budget shrinks as
#: the fixed set grows so the two never sum past this.
_VMEM_TOTAL_BUDGET = 88 * 1024 * 1024


def _row_tile(
    n: int, row_f32s: int | None = None, budget: int = _ROW_BYTES_BUDGET
) -> int:
    """Row-tile size: big enough to amortize grid steps, small enough to
    keep activations VMEM-resident.

    ``row_f32s`` — the per-row f32 count of live row-tiled buffers (see
    :func:`_chain_mem`) — shrinks the tile for wide models so the
    activation working set stays inside ``budget``. The small-model
    regime (``row_f32s`` under ~2000) keeps the 4096-row tile that the
    tracked configs were tuned at."""
    cap = 4096
    if row_f32s is not None:
        cap = max(8, min(cap, budget // (4 * row_f32s) // 8 * 8))
    if n <= cap:
        return -(-n // 8) * 8  # round up to the f32 sublane count
    return cap


def _chain_tile(n: int, chains: Any, extra_row_factor: int = 1) -> int:
    """Tile for ``chains`` from the shared footprint model: the row-tile
    budget is what the total budget leaves after the fixed residents, so
    mid-width models (large params AND wide activations) shrink their
    tiles rather than overshooting ``vmem_limit_bytes``.
    ``extra_row_factor`` scales the per-row estimate for kernels with
    additional row-tiled live state (the PPO loss/sampling buffers)."""
    fixed, row = _chain_mem(chains)
    budget = max(0, _VMEM_TOTAL_BUDGET - fixed)
    return _row_tile(
        n, extra_row_factor * row, budget=min(_ROW_BYTES_BUDGET, budget)
    )


def _chain_mem(chains: Any) -> tuple[int, int]:
    """VMEM footprint model for :func:`fused_chains`'s backward (the
    bigger of the two kernels): ``(fixed_bytes, row_f32s)``.

    ``fixed_bytes`` counts the grid-invariant residents — parameters plus
    their gradient accumulators plus the pre-transposed head weights.
    ``row_f32s`` counts per-row f32s of the row-tiled live set: the input
    and its cotangent, each chain's recomputed activation stack, the
    LayerNorm ``(xhat, s)`` aux, the head cotangents, and a few
    ``dh``-sized transients.
    """
    fixed = 0
    row = 0
    d_in = None
    for layers, heads in chains:
        widths = []
        for layer in layers:
            w = layer[0]
            if d_in is None:
                d_in = w.shape[0]
            widths.append(w.shape[1])
            fixed += sum(int(p.size) * 8 for p in layer)  # param + dparam
        for w, b in heads:
            if d_in is None:
                d_in = w.shape[0]
            fixed += (int(w.size) + int(b.size)) * 8 + int(w.size) * 4  # + w.T
            row += w.shape[1]  # dout cotangent
        row += d_in + sum(widths)  # activation stack hs
        row += sum(wd + 1 for wd, ln in zip(widths, layers) if len(ln) == 4)
        row += 3 * max(widths, default=d_in)  # dh/da/dpre transients
    row += 2 * (d_in or 1)  # x block + dx block
    return fixed, row


def chains_fit_vmem(chains: Any) -> bool:
    """Whether :func:`fused_chains` can run these chains on hardware —
    the resident parameter set must leave headroom for at least a
    minimal (8-row) tile within the total VMEM budget. Callers use this
    to fall back to the XLA implementation for very wide models (e.g.
    ≥2048-wide twin torsos) instead of failing Mosaic allocation."""
    fixed, row = _chain_mem(chains)
    return fixed + 4 * row * 8 <= _VMEM_TOTAL_BUDGET


def _bf(x: jax.Array) -> jax.Array:
    return x.astype(jnp.bfloat16)


# NOTES on the dot helpers:
# - matmuls use ``pl.dot`` with bf16 operands (the MXU's native input
#   precision, matching XLA's default-precision lowering) and an explicit
#   f32 convert on the result: this jax version's Mosaic rejects
#   bf16-output ``dot_general``s, mislowers bf16-in/f32-out ones
#   ('vector.broadcast' dtype mismatch), and spills >100MB of registers
#   on multi-matmul f32 kernels — ``pl.dot`` avoids all three;
# - Mosaic rejects matmuls whose contracted or output dims are below the
#   sublane count (e.g. the [N, 1] observation column of the dummy envs),
#   so tiny dims fall back to VPU FMA loops — exact f32, and cheap since
#   one side is always small.
_SUBLANES = 8


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """[M, K] @ [K, N]."""
    k = a.shape[1]
    n = b.shape[1]
    if k < _SUBLANES:  # sum of outer products on the VPU
        out = a[:, 0:1] * b[0:1, :]
        for i in range(1, k):
            out = out + a[:, i : i + 1] * b[i : i + 1, :]
        return out
    if n < _SUBLANES:
        # Narrow outputs (value/logit heads): XLA lowers these as f32
        # VPU reductions rather than MXU matmuls, so do the same — N
        # lane-reductions in f32 — to match the autodiff path exactly
        # (a bf16 MXU product here was the one observable numeric gap
        # between the fused and unfused paths on hardware).
        cols = [
            jnp.sum(a * jnp.transpose(b[:, i : i + 1]), axis=1, keepdims=True)
            for i in range(n)
        ]
        return cols[0] if n == 1 else jnp.concatenate(cols, axis=1)
    return pl.dot(_bf(a), _bf(b)).astype(jnp.float32)


def _dot_t(a: jax.Array, b: jax.Array) -> jax.Array:
    """a.T @ b contracting over rows: [K, N] from a [M, K], b [M, N]."""
    k = a.shape[1]
    if k < _SUBLANES:  # K row-reductions on the VPU
        rows = [
            jnp.sum(a[:, i : i + 1] * b, axis=0, keepdims=True) for i in range(k)
        ]
        return rows[0] if k == 1 else jnp.concatenate(rows, axis=0)
    return pl.dot(_bf(a), _bf(b), trans_a=True).astype(jnp.float32)


def _dot_bt(a: jax.Array, b: jax.Array) -> jax.Array:
    """a @ b.T contracting over last dims: [M, J] from a [M, K], b [J, K].

    Requires J small OR both dims MXU-sized; the small-K/large-J case
    must go through :func:`_dot` with a pre-transposed ``b`` instead (a
    per-output-column loop here would unroll J>=128 vector ops and blow
    the register allocator).
    """
    k = a.shape[1]
    j = b.shape[0]
    if j < _SUBLANES:  # J lane-reductions on the VPU
        cols = [
            jnp.sum(a * b[i : i + 1, :], axis=1, keepdims=True) for i in range(j)
        ]
        return cols[0] if j == 1 else jnp.concatenate(cols, axis=1)
    assert k >= _SUBLANES, (
        "small-K/large-J product requires a pre-transposed operand"
    )
    return pl.dot(_bf(a), _bf(b), trans_b=True).astype(jnp.float32)


#: Flax ``nn.LayerNorm`` epsilon (its default; the fused layers must
#: match the flax forward bit-for-bit up to matmul precision).
_LN_EPS = 1e-6


def _chain_sizes(chains: Any) -> tuple[tuple[tuple[bool, ...], int], ...]:
    """Static chain structure: per chain, the per-layer LayerNorm flags
    (a layer tuple is ``(W, b)`` or ``(W, b, ln_scale, ln_bias)``) and
    the head count."""
    return tuple(
        (tuple(len(layer) == 4 for layer in layers), len(heads))
        for layers, heads in chains
    )


def _flatten_params(chains: Any) -> list[jax.Array]:
    flat: list[jax.Array] = []
    for layers, heads in chains:
        for layer in layers:
            w, b = layer[0], layer[1]
            flat.append(w)
            flat.append(b.reshape(1, -1))
            if len(layer) == 4:
                flat.append(layer[2].reshape(1, -1))  # LN scale
                flat.append(layer[3].reshape(1, -1))  # LN bias
        for w, b in heads:
            flat.append(w)
            flat.append(b.reshape(1, -1))
    return flat


def _forward_block(
    x: jax.Array, refs: Sequence[Any], sizes: Any, activation: str,
) -> tuple[list[list[jax.Array]], list[list[Any]], list[list[jax.Array]]]:
    """Shared fwd recompute: returns per-chain activation stacks
    (``[x, h_1, ..., h_L]``), per-layer LayerNorm aux ``(xhat, s)`` (or
    ``None``), and head outputs.

    A layer computes ``h = act(maybe_LN(h @ W + b))`` — the flax
    ``MLP(layer_norm=...)`` + trailing activation layout
    (``rl8_tpu/nn/modules/mlp.py:46-51``), with flax's fast-variance
    LayerNorm statistics."""
    act = _ACT_FNS[activation]
    r = 0
    all_hs: list[list[jax.Array]] = []
    all_aux: list[list[Any]] = []
    all_outs: list[list[jax.Array]] = []
    for ln_flags, n_heads in sizes:
        hs = [x]
        aux: list[Any] = []
        h = x
        for has_ln in ln_flags:
            w, b = refs[r][:], refs[r + 1][:]
            r += 2
            z = _dot(h, w) + b
            if has_ln:
                gamma, beta = refs[r][:], refs[r + 1][:]
                r += 2
                mu = jnp.mean(z, axis=1, keepdims=True)
                # Fast variance (flax's default): E[z^2] - E[z]^2,
                # clamped at 0 like flax — f32 cancellation can push it
                # slightly negative (e.g. zero-padded tail rows whose z
                # is the constant bias vector), and rsqrt(negative)
                # would NaN-poison the dgamma/dbeta accumulators.
                var = jnp.mean(z * z, axis=1, keepdims=True) - mu * mu
                s = jax.lax.rsqrt(jnp.maximum(var, 0.0) + _LN_EPS)
                xhat = (z - mu) * s
                aux.append((xhat, s))
                z = xhat * gamma + beta
            else:
                aux.append(None)
            h = act(z)
            hs.append(h)
        outs = []
        for _ in range(n_heads):
            w, b = refs[r][:], refs[r + 1][:]
            r += 2
            outs.append(_dot(h, w) + b)
        all_hs.append(hs)
        all_aux.append(aux)
        all_outs.append(outs)
    return all_hs, all_aux, all_outs


def _fwd_kernel(sizes, activation, n_params, x_ref, *refs):
    params = refs[:n_params]
    outs_refs = refs[n_params:]
    _, _, all_outs = _forward_block(x_ref[:], params, sizes, activation)
    o = 0
    for outs in all_outs:
        for out in outs:
            outs_refs[o][:] = out
            o += 1


def _row_mask(n_rows: int, tile: int) -> None | jax.Array:
    """Validity mask for rows past the logical row count (the final tile
    may be padded with garbage rows — possibly NaN/inf — so callers must
    ``jnp.where`` rather than multiply)."""
    if n_rows % tile == 0:
        return None
    i = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    return (i * tile + rows) < n_rows


def _make_acc() -> Any:
    """Grid-sequential output accumulator: init on the first grid step,
    add on the rest."""
    first = pl.program_id(0) == 0

    def _acc(ref: Any, value: jax.Array) -> None:
        @pl.when(first)
        def _() -> None:
            ref[:] = value

        @pl.when(jnp.logical_not(first))
        def _() -> None:
            ref[:] = ref[:] + value

    return _acc


def _chains_backward(
    sizes: Any,
    activation: str,
    params: Sequence[Any],
    head_wt_refs: Sequence[Any],
    all_hs: list[list[jax.Array]],
    all_aux: list[list[Any]],
    all_douts: list[list[jax.Array]],
    dparam_refs: Sequence[Any],
    acc: Any,
    *,
    need_dx: bool,
) -> None | jax.Array:
    """Backprop per-chain head cotangents through the chains, accumulating
    parameter gradients into ``dparam_refs`` (same layout as the flat
    params). Returns the summed input cotangent when ``need_dx``."""
    act_grad = _ACT_GRAD_FROM_OUT[activation]
    r = 0  # param ref cursor (dparam refs share the layout)
    o = 0  # flat head cursor (head_wt_refs layout)
    dx_total = None
    for c, (ln_flags, n_heads) in enumerate(sizes):
        hs = all_hs[c]
        aux = all_aux[c]
        layer_bases = []
        for has_ln in ln_flags:
            layer_bases.append(r)
            r += 4 if has_ln else 2
        dh = None
        for j in range(n_heads):
            dout = all_douts[c][j]
            acc(dparam_refs[r], _dot_t(hs[-1], dout))
            acc(dparam_refs[r + 1], jnp.sum(dout, axis=0, keepdims=True))
            contrib = _dot(dout, head_wt_refs[o][:])
            dh = contrib if dh is None else dh + contrib
            r += 2
            o += 1
        for layer in range(len(ln_flags) - 1, -1, -1):
            da = dh * act_grad(hs[layer + 1])
            base = layer_bases[layer]
            if ln_flags[layer]:
                # LayerNorm backward: z -> xhat = (z - mu) * s,
                # out = xhat * gamma + beta. Per-row feature reductions
                # run on the VPU lanes.
                xhat, s = aux[layer]
                gamma = params[base + 2][:]
                acc(
                    dparam_refs[base + 2],
                    jnp.sum(da * xhat, axis=0, keepdims=True),
                )
                acc(dparam_refs[base + 3], jnp.sum(da, axis=0, keepdims=True))
                dxhat = da * gamma
                m1 = jnp.mean(dxhat, axis=1, keepdims=True)
                m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
                dpre = s * (dxhat - m1 - xhat * m2)
            else:
                dpre = da
            acc(dparam_refs[base], _dot_t(hs[layer], dpre))
            acc(dparam_refs[base + 1], jnp.sum(dpre, axis=0, keepdims=True))
            if layer > 0 or need_dx:
                dh = _dot_bt(dpre, params[base][:])
        if need_dx:
            dx_total = dh if dx_total is None else dx_total + dh
    return dx_total


def _bwd_kernel(sizes, activation, n_params, n_rows, x_ref, *refs):
    n_douts = sum(n_heads for _, n_heads in sizes)
    params = refs[:n_params]
    dout_refs = refs[n_params : n_params + n_douts]
    # Pre-transposed head weights [d_out, H] (transposing tiny matrices
    # is free in XLA outside the kernel; in-kernel it is not expressible
    # efficiently for the small-contraction case).
    head_wt_refs = refs[n_params + n_douts : n_params + 2 * n_douts]
    dx_ref = refs[n_params + 2 * n_douts]
    dparam_refs = refs[n_params + 2 * n_douts + 1 :]

    tile = x_ref.shape[0]
    valid = _row_mask(n_rows, tile)
    x = x_ref[:]
    if valid is not None:
        x = jnp.where(valid, x, 0.0)
    all_hs, all_aux, _ = _forward_block(x, params, sizes, activation)

    all_douts: list[list[jax.Array]] = []
    o = 0
    for _, n_heads in sizes:
        douts = []
        for _ in range(n_heads):
            dout = dout_refs[o][:]
            if valid is not None:
                dout = jnp.where(valid, dout, 0.0)
            douts.append(dout)
            o += 1
        all_douts.append(douts)

    dx_ref[:] = _chains_backward(
        sizes, activation, params, head_wt_refs, all_hs, all_aux, all_douts,
        dparam_refs, _make_acc(), need_dx=True,
    )


def _call_fwd(
    activation: str, interpret: bool, x: jax.Array, chains: Any
) -> tuple[tuple[jax.Array, ...], ...]:
    sizes = _chain_sizes(chains)
    flat = _flatten_params(chains)
    n = x.shape[0]
    tile = _chain_tile(n, chains)
    grid = (pl.cdiv(n, tile),)
    out_shapes = []
    for layers, heads in chains:
        for w, _ in heads:
            out_shapes.append(jax.ShapeDtypeStruct((n, w.shape[1]), jnp.float32))
    param_specs = [
        pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for p in flat
    ]
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, sizes, activation, len(flat)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=[
            pl.BlockSpec((tile, s.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for s in out_shapes
        ],
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, *flat)
    # Regroup flat outputs per chain.
    grouped: list[tuple[jax.Array, ...]] = []
    o = 0
    for _, n_heads in sizes:
        grouped.append(tuple(outs[o : o + n_heads]))
        o += n_heads
    return tuple(grouped)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_chains(
    activation: str, interpret: bool, x: jax.Array, chains: Any
) -> tuple[tuple[jax.Array, ...], ...]:
    """Evaluate several activation-MLP chains with linear heads, sharing
    the input ``x``, in ONE Pallas kernel.

    ``chains`` is a tuple of ``(layers, heads)`` where ``layers`` and
    ``heads`` are tuples of ``(W [d_in, d_out], b [d_out])``. Each chain
    computes ``h = act(...act(x @ W1 + b1)... @ WL + bL)`` then
    ``out_j = h @ WH_j + bH_j`` per head. Returns a tuple of per-chain
    head-output tuples, all ``float32 [N, d_out]``.

    Differentiable via a recompute-based backward kernel (no saved
    activations; full gradients including ``dx``).
    """
    return _call_fwd(activation, interpret, x, chains)


def _fused_fwd(activation, interpret, x, chains):
    return _call_fwd(activation, interpret, x, chains), (x, chains)


def _fused_bwd(activation, interpret, res, douts):
    x, chains = res
    sizes = _chain_sizes(chains)
    flat = _flatten_params(chains)
    flat_douts = [d for chain_douts in douts for d in chain_douts]
    # Head weights pre-transposed for the in-kernel dh products (the head
    # output dim is below the MXU contraction minimum).
    flat_head_wts = [w.T for _, heads in chains for w, _ in heads]
    n = x.shape[0]
    tile = _chain_tile(n, chains)
    grid = (pl.cdiv(n, tile),)
    dparam_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat]
    out_shapes = [jax.ShapeDtypeStruct(x.shape, jnp.float32), *dparam_shapes]
    param_specs = [
        pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for p in flat
    ]
    dout_specs = [
        pl.BlockSpec((tile, d.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for d in flat_douts
    ]
    head_wt_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in flat_head_wts
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, sizes, activation, len(flat), n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *param_specs,
            *dout_specs,
            *head_wt_specs,
        ],
        out_specs=[
            pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, *flat, *flat_douts, *flat_head_wts)
    dx = outs[0].astype(x.dtype)
    dflat = outs[1:]
    # Rebuild the chains pytree of gradients.
    dchains = []
    r = 0
    for layers, heads in chains:
        dlayers = []
        for layer in layers:
            dlayer = []
            for p in layer:
                dlayer.append(dflat[r].reshape(p.shape).astype(p.dtype))
                r += 1
            dlayers.append(tuple(dlayer))
        dheads = []
        for w, b in heads:
            dheads.append((dflat[r].astype(w.dtype), dflat[r + 1].reshape(b.shape).astype(b.dtype)))
            r += 2
        dchains.append((tuple(dlayers), tuple(dheads)))
    return dx, tuple(dchains)


fused_chains.defvjp(_fused_fwd, _fused_bwd)


# ----------------------------------------------------------------------
# Default-model adapters
# ----------------------------------------------------------------------


def _mlp_layers(params: Any, name: str) -> tuple[tuple[jax.Array, jax.Array], ...]:
    sub = params[name]
    out = []
    i = 0
    while f"Dense_{i}" in sub:
        out.append((sub[f"Dense_{i}"]["kernel"], sub[f"Dense_{i}"]["bias"]))
        i += 1
    return tuple(out)


def _head(params: Any, name: str) -> tuple[jax.Array, jax.Array]:
    return (params[name]["kernel"], params[name]["bias"])


#: Per-model (torso name, head names) layout — the ONE definition of
#: which flax submodules the fused kernels read. The update, act, and
#: apply entry points must agree bit-for-bit (the PPO ratio divides the
#: act kernel's logp by the update kernel's), so all three build their
#: chains through :func:`_default_chain_names`/:func:`_default_chains`.
_DISCRETE_CHAIN_NAMES = (
    ("feature_model", ("feature_head",)),
    ("vf_model", ("vf_head",)),
)
_CONTINUOUS_CHAIN_NAMES = (
    ("latent_model", ("action_mean", "action_log_std")),
    ("vf_model", ("vf_head",)),
)


def _default_chain_names(model: Any) -> tuple[tuple[str, tuple[str, ...]], ...]:
    from ..models import DefaultContinuousModel, DefaultDiscreteModel

    if type(model) is DefaultDiscreteModel:
        return _DISCRETE_CHAIN_NAMES
    if type(model) is DefaultContinuousModel:
        return _CONTINUOUS_CHAIN_NAMES
    raise TypeError(f"{type(model)} has no fused support.")


def _default_chains(model: Any, params: Any) -> tuple:
    """Build the (layers, heads) chains pytree for a default model."""
    return tuple(
        (
            _mlp_layers(params, torso),
            tuple(_head(params, h) for h in heads),
        )
        for torso, heads in _default_chain_names(model)
    )


@dataclass(frozen=True)
class FusedApplySpec:
    """A custom model's declaration of its fused-kernel decomposition.

    Custom MLP-style models (composite observations assembled into one
    flat feature vector, then torso-MLP + linear-head chains — e.g. the
    algotrading ``MischievousMule``) return one of these from
    ``fused_apply_spec()`` to run their torso/head compute through the
    :func:`fused_chains` Pallas kernel while keeping the (cheap,
    model-specific) input assembly and output postprocessing in XLA.
    The whole composition stays differentiable: ``fused_chains`` is a
    custom-VJP op that returns ``dx``, which XLA backprops through
    ``assemble`` (embedding tables and friends get exact gradients).

    Attributes:
        assemble: ``(params, batch) -> x [N, d]`` — build the shared
            chain input from the (possibly composite) observation batch.
            Differentiable w.r.t. ``params``.
        finalize: ``(batch, outs) -> (features, values)`` — map the
            per-chain head-output tuples to the model's return contract
            (reshapes, action masking, ...). Must not need gradients
            w.r.t. ``params`` except through ``outs``.
        chain_names: ``((torso_module_name, (head_module_names, ...)),
            ...)`` naming the flax submodules holding each chain's MLP
            torso (``Dense_i`` + optional ``LayerNorm_i`` entries) and
            linear heads.
    """

    assemble: Any
    finalize: Any
    chain_names: tuple[tuple[str, tuple[str, ...]], ...]


@dataclass(frozen=True)
class FusedRecurrentApplySpec:
    """Recurrent counterpart of :class:`FusedApplySpec`.

    The sequence-dependent part of the model (embedding + RNN cell scan,
    which threads state and is inherently serial over time) stays in
    XLA; the per-row torso/head chains on the RNN outputs run through
    :func:`fused_chains`. Gradients flow back into the RNN through the
    kernel's ``dx``.

    Attributes:
        assemble: ``(params, batch, states) -> (x [B*T, d], new_states)``
            — run the recurrent front half and return the flattened
            per-timestep latents plus the updated state pytree.
        finalize: ``(batch, outs) -> (features, values)`` — as in
            :class:`FusedApplySpec`.
        chain_names: as in :class:`FusedApplySpec`.
    """

    assemble: Any
    finalize: Any
    chain_names: tuple[tuple[str, tuple[str, ...]], ...]


def _named_chains(params: Any, chain_names: Any) -> tuple:
    """Build the ``(layers, heads)`` chains pytree from flax params for
    the named torso/head submodules. A torso layer is ``(W, b)`` or —
    when the module interleaves ``LayerNorm_i`` (``MLP(layer_norm=True)``)
    — ``(W, b, ln_scale, ln_bias)``."""
    chains = []
    for torso, heads in chain_names:
        sub = params[torso]
        layers = []
        i = 0
        while f"Dense_{i}" in sub:
            layer = [sub[f"Dense_{i}"]["kernel"], sub[f"Dense_{i}"]["bias"]]
            if f"LayerNorm_{i}" in sub:
                layer.append(sub[f"LayerNorm_{i}"]["scale"])
                layer.append(sub[f"LayerNorm_{i}"]["bias"])
            layers.append(tuple(layer))
            i += 1
        chains.append(
            (tuple(layers), tuple(_head(params, h) for h in heads))
        )
    return tuple(chains)


def _custom_spec(model: Any, cls: type = FusedApplySpec) -> Any:
    """The model's :class:`FusedApplySpec` when it declares one and the
    kernels can honor it, else ``None``.

    Models with ``dtype=jnp.bfloat16`` (AMP) are accepted: the kernels'
    fixed precision scheme — bf16 MXU inputs with f32 accumulation and
    f32 elementwise math — is at least as precise as flax's
    bf16-everywhere AMP, so the fused path only tightens numerics
    (recorded as a deliberate deviation in PARITY.md). Other explicit
    dtypes are rejected.
    """
    get_spec = getattr(model, "fused_apply_spec", None)
    if get_spec is None:
        return None
    spec = get_spec()
    if spec is None or not isinstance(spec, cls):
        return None
    dtype = getattr(model, "dtype", None)
    if dtype is not None and dtype != jnp.bfloat16:
        return None
    if getattr(model, "activation_fn", None) not in _ACT_FNS:
        return None
    return spec


def supports_fused_apply(model: Any) -> bool:
    """Whether the fused chain kernels can evaluate ``model``'s forward:
    an exact default model (relu/tanh activation, biased dense layers,
    f32), or a custom model declaring a :class:`FusedApplySpec`.

    Default models with an explicit compute ``dtype`` (set by
    ``enable_amp``) are excluded: the kernels run their own fixed
    precision scheme (bf16 matmuls with f32 accumulation and f32
    elementwise math), which would silently bypass the requested AMP
    dtype and diverge numerically from the unfused AMP path. Custom
    spec models opt into exactly that trade (see :func:`_custom_spec`).
    """
    from ..models import DefaultContinuousModel, DefaultDiscreteModel

    if type(model) not in (DefaultContinuousModel, DefaultDiscreteModel):
        return _custom_spec(model) is not None
    if model.dtype is not None:
        return False
    # The fused update path packs observation columns and bitcasts them
    # back as f32 (``ops/packing.py``), which is only meaningful for
    # float observations (f16/bf16 are widened to f32 by pack_rows;
    # int/bool bit patterns would reinterpret as denormal garbage).
    if not jnp.issubdtype(jnp.dtype(model.observation_spec.dtype), jnp.floating):
        return False
    return bool(model.bias) and model.activation_fn in _ACT_FNS


def model_fits_vmem(model: Any, params: Any) -> bool:
    """Whether ``model``'s fused chains fit the kernels' VMEM budget
    (see :func:`chains_fit_vmem`). Algorithms AND this into their fused
    gates at construction — very wide models (≥2048-wide twin torsos)
    train through the XLA autodiff path instead of failing Mosaic
    allocation mid-step. ``params`` is the model's flax param tree."""
    from ..models import DefaultContinuousModel, DefaultDiscreteModel

    if type(model) in (DefaultDiscreteModel, DefaultContinuousModel):
        chains = _default_chains(model, params)
    else:
        spec = _custom_spec(model) or _custom_spec(model, FusedRecurrentApplySpec)
        if spec is None:
            return False
        chains = _named_chains(params, spec.chain_names)
    return chains_fit_vmem(chains)


def fused_custom_apply(
    model: Any, params: Any, batch: Any, *, interpret: bool = False
) -> tuple[dict[str, jax.Array], jax.Array]:
    """Drop-in replacement for ``model.apply({"params": params}, batch)``
    on models declaring a :class:`FusedApplySpec`: XLA assembles the
    input and postprocesses the heads; the torso/head chains run in one
    Pallas kernel. Differentiable end to end (including ``assemble``'s
    params, e.g. embedding tables, via the kernel's ``dx``)."""
    spec = _custom_spec(model)
    assert spec is not None, f"{type(model).__name__} has no fused apply spec"
    x = spec.assemble(params, batch)
    chains = _named_chains(params, spec.chain_names)
    outs = fused_chains(model.activation_fn, interpret, x, chains)
    return spec.finalize(batch, outs)


def supports_fused_recurrent_apply(model: Any) -> bool:
    """Whether ``model`` declares a :class:`FusedRecurrentApplySpec` the
    chain kernels can honor (same dtype/activation rules as
    :func:`_custom_spec`)."""
    return _custom_spec(model, FusedRecurrentApplySpec) is not None


def fused_recurrent_custom_apply(
    model: Any, params: Any, batch: Any, states: Any, *, interpret: bool = False
) -> tuple[tuple[dict[str, jax.Array], jax.Array], Any]:
    """Drop-in replacement for
    ``model.apply({"params": params}, batch, states)`` on recurrent
    models declaring a :class:`FusedRecurrentApplySpec`: XLA runs the
    RNN front half (state threading is serial over time and stays
    outside the kernel); the per-row torso/head chains run in one Pallas
    kernel. Differentiable end to end, including BPTT through the RNN
    via the kernel's ``dx``."""
    spec = _custom_spec(model, FusedRecurrentApplySpec)
    assert spec is not None, (
        f"{type(model).__name__} has no fused recurrent apply spec"
    )
    x, new_states = spec.assemble(params, batch, states)
    chains = _named_chains(params, spec.chain_names)
    outs = fused_chains(model.activation_fn, interpret, x, chains)
    return spec.finalize(batch, outs), new_states


def fused_default_apply(
    model: Any, params: Any, batch: Any, *, interpret: bool = False
) -> tuple[dict[str, jax.Array], jax.Array]:
    """Drop-in replacement for ``model.apply({"params": params}, batch)``
    on the default models, computed with the fused Pallas kernels.

    Matches the flax forward up to matmul precision (bf16 multiplies with
    f32 accumulation — XLA's own default-precision lowering for TPU).
    """
    from ..models import DefaultContinuousModel, DefaultDiscreteModel

    obs = batch[DataKeys.OBS]
    act = model.activation_fn
    chains = _default_chains(model, params)
    if type(model) is DefaultDiscreteModel:
        (logits,), (values,) = fused_chains(act, interpret, obs, chains)
        action_dim = model.action_spec.shape[0]
        n = model.action_spec.n
        return {"logits": logits.reshape(-1, action_dim, n)}, values
    assert type(model) is DefaultContinuousModel
    (mean, log_std), (values,) = fused_chains(act, interpret, obs, chains)
    return {"mean": mean, "log_std": jnp.tanh(log_std)}, values
