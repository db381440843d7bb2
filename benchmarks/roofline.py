"""Analytic FLOPs / HBM-traffic accounting for the tracked bench configs.

Relates every throughput line to TPU v5e hardware peaks instead of only
to the reference's 1M transitions/s claim (the reference publishes no
FLOPs accounting at all — its perf claims are README prose,
``/root/reference/README.md:8-10``):

- ``mfu`` — model-matmul FLOPs per iteration / (iteration time x MXU
  peak). Counts forward matmuls exactly from the layer dimensions
  (2*in*out per dense row), backward as 2x forward (dW + dx), and the
  rollout's per-step forwards including the bootstrap sample. Env
  steps, GAE, distributions, and elementwise work are excluded
  (negligible FLOPs for every tracked config).
- ``hbm_gbps_util`` — a LOWER-BOUND byte count / (iteration time x HBM
  peak): bytes that must cross HBM at least once per iteration (rollout
  buffer written once + read per SGD epoch, parameters read per
  minibatch, gradients + Adam state per optimizer step). Activation
  re-materialization traffic — the thing the fused kernels eliminate —
  is deliberately NOT counted, so autodiff-path configs show extra gap
  between measured time and this floor.

A config is FLOP-bound when ``mfu`` approaches 1 and bandwidth-bound
when ``hbm_gbps_util`` approaches 1 while ``mfu`` stays small; both
small means overhead-bound (dispatch, serial scans, tiny-op latency).
``docs/performance.md`` § "Roofline accounting" interprets the measured
numbers per config.
"""

from __future__ import annotations

from typing import Sequence

# TPU v5e (v5 lite) single-chip peaks: 197 TFLOP/s bf16 on the MXU and
# 819 GB/s HBM bandwidth (public chip specs; the same numbers the
# scaling-book recipes use). XLA's default f32 `jnp.dot` lowering on TPU
# multiplies in bf16, and the fused kernels run bf16 matmuls explicitly,
# so the bf16 peak is the right MXU denominator for every config here.
V5E_PEAK_MXU_FLOPS = 197e12
V5E_PEAK_HBM_BYTES = 819e9

F32 = 4  # bytes


def dense_chain_flops(dims: Sequence[int]) -> float:
    """Forward matmul FLOPs per row of a dense chain ``dims[0] -> ... ->
    dims[-1]`` (2*in*out per layer; bias adds are negligible)."""
    return float(sum(2 * a * b for a, b in zip(dims[:-1], dims[1:])))


def twin_torso_flops(
    obs_dim: int, hiddens: Sequence[int], head_outs: Sequence[int]
) -> float:
    """Per-row forward FLOPs of the default twin-torso models
    (``rl8_tpu/models/_feedforward.py``): a feature torso + heads and an
    identically-shaped value torso + 1-wide head. ``head_outs`` lists
    the feature-side head widths (e.g. ``[n_actions]`` discrete,
    ``[1, 1]`` continuous mean/log_std)."""
    torso = dense_chain_flops([obs_dim, *hiddens])
    heads = sum(dense_chain_flops([hiddens[-1], h]) for h in head_outs)
    vf = torso + dense_chain_flops([hiddens[-1], 1])
    return torso + heads + vf


def lstm_flops(in_dim: int, hidden: int, num_layers: int) -> float:
    """Per-transition forward FLOPs of a stacked LSTM (one cell
    application per timestep: input and hidden matmuls into 4 gates)."""
    total, d = 0.0, in_dim
    for _ in range(num_layers):
        total += 2 * (d * 4 * hidden + hidden * 4 * hidden)
        d = hidden
    return total


def mule_flops(
    seq_len: int = 4,
    invested_embed_dim: int = 2,
    hiddens: Sequence[int] = (128, 128),
) -> float:
    """MischievousMule per-row forward FLOPs: embedding lookup (0
    matmul FLOPs) + 4 interval sums (negligible) + twin LayerNorm-MLP
    torsos over the 7-wide feature vector + 3/1-wide heads."""
    in_dim = invested_embed_dim + 1 + 4  # invested + log-change + 4 sums
    return twin_torso_flops(in_dim, hiddens, [3])


def alpaca_flops(
    seq_len: int = 4,
    embed: int = 8,
    num_heads: int = 4,
    num_layers: int = 2,
    hidden: int = 64,
    invested_embed_dim: int = 2,
    hiddens: Sequence[int] = (64, 64),
) -> float:
    """AttentiveAlpaca per-row forward FLOPs: price embedding per token,
    a shared-parameter self-attention stack applied ``num_layers`` times
    over the ``S = seq_len + 1`` token window (in/out projections + FFN
    per token, plus the two S^2 d score/value einsums), masked-average
    pooling, then the twin MLP torsos + heads."""
    S = seq_len + 1
    per_token_proj = dense_chain_flops([embed, 3 * embed]) + dense_chain_flops(
        [embed, embed]
    )
    per_token_ffn = dense_chain_flops([embed, hidden, embed])
    scores = 2 * 2 * S * S * embed  # qk^T and attn@v, summed over heads
    attn = num_layers * (S * (per_token_proj + per_token_ffn) + scores)
    price_embed = S * dense_chain_flops([1, embed])
    in_dim = invested_embed_dim + 1 + embed
    return price_embed + attn + twin_torso_flops(in_dim, hiddens, [3])


#: v5e VPU elementwise peak, derived from the chip clock implied by the
#: published MXU peak: 197e12 = 4 MXUs x 128x128 x 2 FLOP x clock =>
#: clock ~1.5 GHz; VPU = (8,128) lanes x 4 ALUs x clock ~= 6.2e12
#: f32 element-ops/s. A structural ceiling, not a sustained target —
#: real kernels interleave relayouts and multi-operand reads.
V5E_PEAK_VPU_OPS = 6.2e12


def alpaca_floor(
    num_envs: int = 4096,
    horizon: int = 32,
    minibatches_per_epoch: int = 4,
    num_sgd_iters: int = 4,
    seq_len: int = 4,
    embed: int = 8,
    num_heads: int = 4,
    num_layers: int = 2,
    hidden: int = 64,
    hiddens: Sequence[int] = (64, 64),
) -> dict[str, float]:
    """Structural per-iteration bounds for AttentiveAlpaca's update.

    The model's matmuls have tiny contraction/output dims (K, N <= 64):
    a single K x N pass occupies K*N/128^2 of the MXU systolic array, so
    shape — not the framework — caps the attainable matmul rate. Two
    dot bounds bracket reality: ``naive_dot_ms`` (all dot FLOPs at the
    full 197T peak — unattainable for these shapes) and
    ``single_pass_dot_ms`` (each dot at its K*N/128^2 utilization — a
    pessimistic bound XLA partially beats by batching the shared-weight
    token dots into convolutions). The measured dot time sits between
    them (7.4 ms/iter, trace category table in docs/performance.md
    section "AttentiveAlpaca floor"). ``vpu_ms_floor`` is the raw VPU
    element count for the score/softmax/context chains at the
    :data:`V5E_PEAK_VPU_OPS` ceiling. All values are per-iteration
    milliseconds at the tracked shape.
    """
    S = seq_len + 1
    rows_per_grad = num_envs * horizon // minibatches_per_epoch
    grads = minibatches_per_epoch * num_sgd_iters
    in_dim = 2 + 1 + embed
    # Per-row fwd dots as (K, N, copies): a K x N single-pass matmul
    # occupies K*N of the 128x128 array, so its attainable rate is
    # peak * K*N/128^2 — shape-capped utilization, independent of M.
    dots = [
        (embed, 3 * embed, num_layers * S),   # qkv projection
        (embed, embed, num_layers * S),       # attention out projection
        (embed, hidden, num_layers * S),      # FFN up
        (hidden, embed, num_layers * S),      # FFN down
        (in_dim, hiddens[0], 2),              # twin torso layer 1
        (hiddens[0], hiddens[1], 2),          # twin torso layer 2
    ]
    # fwd+bwd ~= 3x fwd; collect adds one fwd per transition.
    total_rows = rows_per_grad * grads
    naive_dot_ms = 0.0
    single_pass_dot_ms = 0.0
    for k, n, copies in dots:
        flops = 2 * k * n * copies
        total = 3 * flops * total_rows + flops * num_envs * horizon
        util = min(1.0, (k / 128)) * min(1.0, (n / 128))
        naive_dot_ms += total / V5E_PEAK_MXU_FLOPS * 1e3
        single_pass_dot_ms += total / (V5E_PEAK_MXU_FLOPS * util) * 1e3
    # VPU: scores qk^T + attn@v (2d mult-adds per score each), softmax
    # (~8 ops incl. the exp), masking/residual (~6), per head per (S,S)
    # cell per layer; backward ~2x.
    per_row_vpu = (
        num_layers * num_heads * S * S * (2 * 2 * embed + 8 + 6)
    )
    vpu_ms = 3 * per_row_vpu * total_rows / V5E_PEAK_VPU_OPS * 1e3
    return {
        "naive_dot_ms": naive_dot_ms,
        "single_pass_dot_ms": single_pass_dot_ms,
        "vpu_ms_floor": vpu_ms,
    }


def lemur_flops(
    invested_embed_dim: int = 2,
    hidden_size: int = 64,
    num_layers: int = 1,
    hiddens: Sequence[int] = (64, 64),
) -> float:
    """LazyLemur per-transition forward FLOPs: LSTM cell over the 4-wide
    input + twin MLP torsos + heads over the hidden state."""
    in_dim = invested_embed_dim + 1 + 1
    return lstm_flops(in_dim, hidden_size, num_layers) + twin_torso_flops(
        hidden_size, hiddens, [3]
    )


def params_bytes_twin_torso(
    obs_dim: int, hiddens: Sequence[int], head_outs: Sequence[int]
) -> float:
    """f32 parameter bytes of the default twin-torso models (weights
    dominate; biases/LayerNorm scales included via the +1 row)."""
    dims = [obs_dim, *hiddens]
    torso = sum((a + 1) * b for a, b in zip(dims[:-1], dims[1:]))
    heads = sum((hiddens[-1] + 1) * h for h in head_outs)
    vf = torso + (hiddens[-1] + 1) * 1
    return F32 * float(torso + heads + vf)


def iteration_flops(
    *,
    num_envs: int,
    horizon: int,
    num_sgd_iters: int,
    fwd_flops_per_row: float,
    bwd_multiplier: float = 2.0,
) -> float:
    """Model-matmul FLOPs per train iteration: ``horizon + 1`` rollout
    forwards (incl. the bootstrap value sample) at ``num_envs`` rows,
    plus ``num_sgd_iters`` epochs of forward+backward over the whole
    ``num_envs * horizon`` buffer (the tracked configs all train on
    every transition each epoch)."""
    collect = num_envs * (horizon + 1) * fwd_flops_per_row
    update = (
        num_sgd_iters
        * num_envs
        * horizon
        * (1.0 + bwd_multiplier)
        * fwd_flops_per_row
    )
    return collect + update


def iteration_hbm_floor(
    *,
    num_envs: int,
    horizon: int,
    num_sgd_iters: int,
    minibatches_per_epoch: int,
    obs_dim: int,
    params_bytes: float,
    states_bytes_per_env: float = 0.0,
) -> float:
    """Lower-bound HBM bytes per train iteration.

    Counts: the rollout buffer written once at collect (obs + action +
    logp + value + reward + recurrent states) and read once per SGD
    epoch (training consumes every transition each epoch); parameters read
    once per rollout step and once per minibatch; gradients written +
    read and Adam moments read + written once per optimizer step.
    Activation spills are excluded on purpose (see module docstring).
    """
    row_bytes = F32 * (obs_dim + 6) + states_bytes_per_env
    buffer_bytes = num_envs * horizon * row_bytes
    collect = buffer_bytes + (horizon + 1) * params_bytes
    update_reads = num_sgd_iters * buffer_bytes
    update_params = (
        num_sgd_iters * minibatches_per_epoch * (params_bytes + 2 * params_bytes)
        + 4 * params_bytes  # Adam m/v read+write once per iteration
    )
    return collect + update_reads + update_params


def summarize(
    flops_per_iter: float, hbm_floor_bytes: float, seconds_per_iter: float
) -> dict[str, float]:
    """MFU and HBM-floor utilization against v5e single-chip peaks."""
    return {
        "mfu": flops_per_iter / (seconds_per_iter * V5E_PEAK_MXU_FLOPS),
        "hbm_gbps_util": hbm_floor_bytes
        / (seconds_per_iter * V5E_PEAK_HBM_BYTES),
    }
