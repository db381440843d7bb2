"""Recurrent PPO algorithm.

TPU-native redesign of
``/root/reference/src/rl8/algorithms/_recurrent.py``. Same compiled
structure as the feedforward algorithm, with the recurrent deltas:

- ``collect`` threads recurrent states through the horizon scan,
  re-initializing them on the ``seq_len * seqs_per_state_reset`` cadence
  (``_recurrent.py:384-392``) with a ``seqs`` counter carried in the
  jitted state (``:430-431``);
- ``step`` reshapes the buffer into ``[B * (T / seq_len), seq_len]``
  truncated-BPTT sequences (``:518``) whose stored *initial* states seed
  each sequence's forward pass (``:555-564``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..data import (
    CollectStats,
    DataKeys,
    RecurrentAlgorithmHparams,
    RecurrentAlgorithmState,
    StepStats,
)
from ..distributions import Distribution
from ..env import EnvFactory
from ..models import RecurrentModel, RecurrentModelFactory
from ..nn import generalized_advantage_estimate, ppo_losses
from ..policies import RecurrentPolicy
from ..schedulers import EntropyScheduler, LRScheduler, ScheduleKind
from ..specs import assert_nd_spec
from ..utils import profile_ms
from ._base import GenericAlgorithmBase

__all__ = ["RecurrentAlgorithmConfig", "RecurrentAlgorithm"]


@dataclass
class RecurrentAlgorithmConfig:
    """Config for building a recurrent PPO algorithm
    (``/root/reference/src/rl8/algorithms/_recurrent.py:29-192``); see
    :class:`rl8_tpu.algorithms.AlgorithmConfig` for shared fields."""

    model: None | RecurrentModel = None
    model_cls: None | RecurrentModelFactory = None
    model_config: None | dict[str, Any] = None
    distribution_cls: None | type[Distribution] = None
    horizon: int = 32
    horizons_per_env_reset: int = 1
    num_envs: int = 8192
    #: Truncated backprop-through-time sequence length.
    seq_len: int = 4
    #: Sequences before recurrent states re-initialize (negative = never).
    seqs_per_state_reset: int = 8
    optimizer_cls: Callable[..., optax.GradientTransformation] = optax.adam
    optimizer_config: None | dict[str, Any] = None
    accumulate_grads: bool = False
    enable_amp: bool = False
    lr_schedule: None | list[tuple[int, float]] = None
    lr_schedule_kind: ScheduleKind = "step"
    entropy_coeff: float = 0.0
    entropy_coeff_schedule: None | list[tuple[int, float]] = None
    entropy_coeff_schedule_kind: ScheduleKind = "step"
    gae_lambda: float = 0.95
    gamma: float = 0.95
    sgd_minibatch_size: None | int = None
    num_sgd_iters: int = 4
    shuffle_minibatches: bool = True
    #: Rows (sequences, here) per shuffle unit: each epoch permutes
    #: blocks of this many consecutive buffer rows instead of single
    #: rows — ~8x cheaper on TPU (gathers pay a fixed per-row cost);
    #: clamped to divide the minibatch size. ``1`` restores the exact
    #: row-level uniform shuffle (PARITY.md).
    shuffle_block_rows: int = 8
    clip_param: float = 0.2
    vf_clip_param: float = 5.0
    dual_clip_param: None | float = None
    vf_coeff: float = 1.0
    target_kl_div: None | float = None
    max_grad_norm: float = 5.0
    normalize_advantages: bool = True
    normalize_rewards: bool = True
    #: Run the optimizer over a single flattened parameter vector; see
    #: :class:`rl8_tpu.algorithms.AlgorithmConfig`.
    flatten_optimizer: bool = True
    #: Run custom recurrent models declaring a ``FusedRecurrentApplySpec``
    #: through the fused Pallas chain kernels (RNN front half in XLA,
    #: post-RNN torso/head chains in one kernel; see ``ops/fused_mlp.py``).
    #: Auto-disabled on CPU, in GSPMD exact-sharding mode, for models
    #: without a spec, and for models whose chains exceed the kernels'
    #: VMEM budget.
    fused_forward: bool = False
    #: Compute each minibatch's losses AND parameter gradients with ONE
    #: fused Pallas kernel (LSTM BPTT + heads + PPO losses in VMEM; see
    #: ``ops/fused_rnn_ppo.py``; stacked LSTMs fuse up to 8 layers).
    #: Auto-disabled for custom models or distributions and in GSPMD
    #: exact-sharding mode.
    fused_update: bool = True
    #: Sample rollout actions/log-probs/values/states with ONE fused
    #: Pallas kernel per step (LSTM cell + heads + TPU-hardware-PRNG
    #: sampling; see ``ops/fused_rnn_act.py``). Rollouts differ bit-wise
    #: from the unfused path at equal seeds while following identical
    #: distributions. Same auto-disable conditions as ``fused_update``.
    fused_act: bool = True
    seed: int = 0
    mesh: Any = None
    #: See :class:`rl8_tpu.algorithms.AlgorithmConfig.exact_sharding`.
    exact_sharding: bool = False

    def build(self, env_cls: EnvFactory) -> "RecurrentAlgorithm":
        """Build and validate a :class:`RecurrentAlgorithm`."""
        algo = RecurrentAlgorithm(env_cls, config=self)
        algo.validate()
        return algo


def _seq_major(x: jax.Array, L: int) -> jax.Array:
    """Time-major ``[T, B, ...]`` -> sequence batch ``[B * T/L, L, ...]``
    matching the reference's ``buffer.reshape(-1, seq_len)`` element order
    (``_recurrent.py:518``)."""
    T, B = x.shape[:2]
    x = x.reshape(T // L, L, B, *x.shape[2:])
    x = jnp.moveaxis(x, 2, 0)  # [B, T/L, L, ...]
    return x.reshape(B * (T // L), L, *x.shape[3:])


class RecurrentAlgorithm(
    GenericAlgorithmBase[
        RecurrentAlgorithmHparams, RecurrentAlgorithmState, RecurrentPolicy
    ]
):
    """An optimized recurrent PPO algorithm, compiled end-to-end for TPU
    (``/root/reference/src/rl8/algorithms/_recurrent.py:195-756``).

    Args:
        env_cls: Highly parallelized environment factory.
        config: See :class:`RecurrentAlgorithmConfig`.

    """

    def __init__(
        self, env_cls: EnvFactory, /, config: None | RecurrentAlgorithmConfig = None
    ) -> None:
        config = config or RecurrentAlgorithmConfig()
        max_num_envs = getattr(env_cls, "max_num_envs", config.num_envs)
        num_envs = min(config.num_envs, max_num_envs)
        max_horizon = getattr(env_cls, "max_horizon", 1_000_000)
        horizon = min(config.horizon, max_horizon)
        self.env = env_cls(num_envs, horizon)
        assert_nd_spec(self.env.observation_spec)
        assert_nd_spec(self.env.action_spec)

        model_config = dict(config.model_config or {})
        if config.model is None and config.model_cls is None and config.enable_amp:
            model_config.setdefault("dtype", jnp.bfloat16)
        self.policy = RecurrentPolicy(
            self.env.observation_spec,
            self.env.action_spec,
            model=config.model,
            model_cls=config.model_cls,
            model_config=model_config,
            distribution_cls=config.distribution_cls,
        )

        sgd_minibatch_size = (
            config.sgd_minibatch_size
            if config.sgd_minibatch_size is not None
            else num_envs * (horizon // config.seq_len)
        )
        self.hparams = RecurrentAlgorithmHparams(
            accumulate_grads=config.accumulate_grads,
            clip_param=config.clip_param,
            dual_clip_param=config.dual_clip_param,
            enable_amp=config.enable_amp,
            gae_lambda=config.gae_lambda,
            gamma=config.gamma,
            horizon=horizon,
            horizons_per_env_reset=config.horizons_per_env_reset,
            max_grad_norm=config.max_grad_norm,
            normalize_advantages=config.normalize_advantages,
            normalize_rewards=config.normalize_rewards,
            num_envs=num_envs,
            num_sgd_iters=config.num_sgd_iters,
            seq_len=config.seq_len,
            seqs_per_state_reset=config.seqs_per_state_reset,
            sgd_minibatch_size=sgd_minibatch_size,
            shuffle_minibatches=config.shuffle_minibatches,
            shuffle_block_rows=config.shuffle_block_rows,
            target_kl_div=config.target_kl_div,
            vf_clip_param=config.vf_clip_param,
            vf_coeff=config.vf_coeff,
        ).validate()

        optimizer_config = dict(config.optimizer_config or {"lr": 1e-3})
        if "lr" in optimizer_config and "learning_rate" in optimizer_config:
            raise ValueError(
                "Pass only one of `lr`/`learning_rate` in"
                " `optimizer_config`; both were provided."
            )
        lr0 = optimizer_config.pop("lr", None)
        if lr0 is None:
            lr0 = optimizer_config.pop("learning_rate", 1e-3)
        self.lr_scheduler = LRScheduler(
            lr0, schedule=config.lr_schedule, kind=config.lr_schedule_kind
        )
        self.entropy_scheduler = EntropyScheduler(
            config.entropy_coeff,
            schedule=config.entropy_coeff_schedule,
            kind=config.entropy_coeff_schedule_kind,
        )
        self._static_zero_entropy = (
            config.entropy_coeff_schedule is None and config.entropy_coeff == 0.0
        )

        rng = jax.random.key(config.seed)
        rng, params_key, reset_key = jax.random.split(rng, 3)
        # Trace the param shapes for free; the real init runs inside
        # the single jitted ``_init`` program below (eager flax init
        # pays one remote XLA compile per layer op on TPU toolchains —
        # see the feedforward ``__init__``).
        params_shapes = jax.eval_shape(self.policy.init_params, params_key)

        max_grad_norm = config.max_grad_norm
        optimizer_cls = config.optimizer_cls
        flatten = config.flatten_optimizer

        def _make_optimizer(learning_rate: Any) -> optax.GradientTransformation:
            opt = optax.chain(
                optax.clip_by_global_norm(max_grad_norm),
                optimizer_cls(learning_rate, **optimizer_config),
            )
            if flatten:
                from ..utils.optim import flatten_optimizer

                opt = flatten_optimizer(opt, params_shapes)
            return opt

        self.optimizer = optax.inject_hyperparams(_make_optimizer)(learning_rate=lr0)

        def _init(params_key: jax.Array, reset_key: jax.Array):
            params = self.policy.init_params(params_key)
            opt_state = self.optimizer.init(params)
            env_state, _ = self.env.reset(reset_key)
            return params, opt_state, env_state, self._zero_buffer()

        params, opt_state, env_state, buffer = jax.jit(_init)(
            params_key, reset_key
        )
        self.state = RecurrentAlgorithmState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            rng=rng,
            buffer=buffer,
            horizons=jnp.asarray(0, dtype=jnp.int32),
            buffered=jnp.asarray(False),
            reward_scale=jnp.asarray(1.0, dtype=jnp.float32),
            seqs=jnp.asarray(0, dtype=jnp.int32),
        )
        self._init_sharding(
            env_cls, config.mesh, config.exact_sharding,
            num_envs, horizon, sgd_minibatch_size,
        )
        sharded_exact = self.mesh is not None and self._axis is None
        self._horizons_host = 0
        # The fused Pallas kernels run per shard under shard_map but
        # can't be auto-partitioned by GSPMD exact mode.
        on_tpu = jax.local_devices()[0].platform == "tpu"
        from ..ops.gae import gae_fits_vmem

        self._use_pallas_gae = (
            not sharded_exact and on_tpu and gae_fits_vmem(self.hparams.horizon)
        )
        from ..distributions import SquashedNormal
        from ..ops.fused_rnn_ppo import supports_fused_rnn_update

        self._squashed_dist = self.policy.distribution_cls is SquashedNormal
        fused_ok = supports_fused_rnn_update(
            self.policy.model,
            self.policy.distribution_cls,
            zero_entropy=self._static_zero_entropy,
        )
        #: Fully-fused recurrent PPO update (see ``ops/fused_rnn_ppo.py``).
        self._fused_update = (
            config.fused_update and not sharded_exact and on_tpu and fused_ok
        )
        #: Fused recurrent rollout sampling (see ``ops/fused_rnn_act.py``).
        self._fused_act = (
            config.fused_act and not sharded_exact and on_tpu and fused_ok
        )
        from ..ops.fused_mlp import model_fits_vmem, supports_fused_recurrent_apply

        #: Fused chain kernels for custom recurrent models declaring a
        #: ``FusedRecurrentApplySpec`` (see ``ops/fused_mlp.py``).
        self._fused_forward = (
            config.fused_forward
            and not sharded_exact
            and on_tpu
            and supports_fused_recurrent_apply(self.policy.model)
            and model_fits_vmem(self.policy.model, self.state.params)
        )

    def _apply_model(
        self, params: Any, batch: Any, states: Any
    ) -> tuple[tuple[dict[str, jax.Array], jax.Array], Any]:
        """Model forward: the fused chain kernels for custom models
        declaring a ``FusedRecurrentApplySpec``, the flax module
        otherwise. (Default recurrent models use the fully-fused
        LSTM+PPO kernels gated above instead.)"""
        if self._fused_forward:
            from ..ops.fused_mlp import fused_recurrent_custom_apply

            return fused_recurrent_custom_apply(
                self.policy.model, params, batch, states
            )
        return self.policy.model.apply({"params": params}, batch, states)

    def _zero_buffer(self, num_envs: None | int = None) -> dict[str, Any]:
        """Time-major buffer; adds per-step recurrent states
        (``_recurrent.py:260-278``)."""
        B = self.hparams.num_envs if num_envs is None else num_envs
        T = self.hparams.horizon
        buf: dict[str, Any] = {
            DataKeys.OBS: self.env.observation_spec.zero((T + 1, B)),
            DataKeys.STATES: jax.tree_util.tree_map(
                lambda s: jnp.broadcast_to(s, (T + 1, *s.shape)).copy(),
                self.policy.init_states(B),
            ),
            DataKeys.REWARDS: jnp.zeros((T, B, 1)),
            DataKeys.ACTIONS: self.env.action_spec.zero((T, B)),
            DataKeys.LOGP: jnp.zeros((T, B, 1)),
            DataKeys.VALUES: jnp.zeros((T + 1, B, 1)),
        }
        if self.hparams.normalize_rewards:
            buf[DataKeys.REVERSED_DISCOUNTED_RETURNS] = jnp.zeros((T + 1, B, 1))
        return buf

    # ------------------------------------------------------------------
    # collect
    # ------------------------------------------------------------------

    def _collect_impl(
        self,
        state: RecurrentAlgorithmState,
        env_config: None | dict[str, Any],
        deterministic: bool,
    ) -> tuple[RecurrentAlgorithmState, dict[str, jax.Array]]:
        """One fully-jitted recurrent rollout (``_recurrent.py:325-479``)."""
        h = self.hparams
        B, T = self._impl_B, h.horizon  # B is per-shard under shard_map
        env = self._impl_env
        model = self.policy.model
        dist_cls = self.policy.distribution_cls
        buffer = state.buffer

        rng, reset_key, scan_key = jax.random.split(state.rng, 3)
        if self._axis is not None:
            shard = jax.lax.axis_index(self._axis)
            reset_key = jax.random.fold_in(reset_key, shard)
            scan_key = jax.random.fold_in(scan_key, shard)

        def _do_reset(_: None) -> tuple[Any, Any, jax.Array, jax.Array]:
            env_state, obs0 = env.reset(
                reset_key, state=state.env_state, config=env_config
            )
            return env_state, obs0, jnp.zeros((B, 1)), jnp.asarray(True)

        def _carry(_: None) -> tuple[Any, Any, jax.Array, jax.Array]:
            obs0 = jax.tree_util.tree_map(lambda x: x[-1], buffer[DataKeys.OBS])
            rev0 = (
                buffer[DataKeys.REVERSED_DISCOUNTED_RETURNS][-1]
                if h.normalize_rewards
                else jnp.zeros((B, 1))
            )
            return state.env_state, obs0, rev0, jnp.asarray(False)

        if h.horizons_per_env_reset < 0:
            reset_now = state.horizons == 0
        else:
            reset_now = (state.horizons % h.horizons_per_env_reset) == 0
        env_state, obs0, rev0, was_reset = jax.lax.cond(
            reset_now, _do_reset, _carry, None
        )

        # Recurrent states always carry across collects
        # (``_recurrent.py:380-382``); the reset cadence below reinits them.
        states0 = jax.tree_util.tree_map(lambda s: s[-1], buffer[DataKeys.STATES])
        init_states = self.policy.init_states(B)

        def _scan_step(carry: Any, xs: Any) -> tuple[Any, Any]:
            t, key = xs
            env_state, obs, states, rev, seqs = carry
            # State re-init cadence (``_recurrent.py:384-392``).
            if h.seqs_per_state_reset < 0:
                reset_states = (seqs == 0) & (t == 0)
            else:
                reset_states = ((t % h.seq_len) == 0) & (
                    (seqs % h.seqs_per_state_reset) == 0
                )
            states = jax.tree_util.tree_map(
                lambda init, s: jnp.where(reset_states, init, s),
                init_states,
                states,
            )
            if self._fused_act:
                from ..ops.fused_rnn_act import fused_rnn_act

                actions, logp, values, new_states = fused_rnn_act(
                    model, state.params, obs, states, key,
                    deterministic=deterministic,
                    squashed=self._squashed_dist,
                )
            else:
                in_batch = {
                    DataKeys.OBS: jax.tree_util.tree_map(
                        lambda o: o[:, None], obs
                    )
                }
                (features, values), new_states = self._apply_model(
                    state.params, in_batch, states
                )
                dist = dist_cls(features, model)
                if deterministic:
                    actions = dist.deterministic_sample()
                else:
                    actions = dist.sample(key)
                logp = dist.logp(actions)
            env_state, obs_next, rewards = env.step(env_state, actions)
            rev_next = h.gamma * rev + rewards if h.normalize_rewards else rev
            seqs = seqs + (((t + 1) % h.seq_len) == 0).astype(jnp.int32)
            return (
                (env_state, obs_next, new_states, rev_next, seqs),
                (obs_next, states, actions, logp, values, rewards, rev_next),
            )

        keys = jax.random.split(scan_key, T)
        ts = jnp.arange(T, dtype=jnp.int32)
        (env_state, _, final_states, _, seqs), ys = jax.lax.scan(
            _scan_step, (env_state, obs0, states0, rev0, state.seqs), (ts, keys)
        )
        obs_rest, in_states, actions, logp, values, rewards, rev_rest = ys

        # Bootstrap value at the final observation (``:433-446``).
        in_batch = {
            DataKeys.OBS: jax.tree_util.tree_map(
                lambda o: o[-1][:, None], obs_rest
            )
        }
        (_, v_last), _ = self._apply_model(
            state.params, in_batch, final_states
        )

        obs_full = jax.tree_util.tree_map(
            lambda first, rest: jnp.concatenate([first[None], rest], axis=0),
            obs0,
            obs_rest,
        )
        # Buffer states: input states per step + the carried-out states.
        states_full = jax.tree_util.tree_map(
            lambda per_t, last: jnp.concatenate([per_t, last[None]], axis=0),
            in_states,
            final_states,
        )
        values_full = jnp.concatenate([values, v_last[None]], axis=0)
        # f32 casts pin the buffer template's dtypes (see the
        # feedforward counterpart): custom bf16 models must not change
        # the scan-carried buffer's dtype.
        new_buffer: dict[str, Any] = {
            DataKeys.OBS: obs_full,
            DataKeys.STATES: states_full,
            DataKeys.REWARDS: rewards.astype(jnp.float32),
            DataKeys.ACTIONS: actions,
            DataKeys.LOGP: logp.astype(jnp.float32),
            DataKeys.VALUES: values_full.astype(jnp.float32),
        }
        from ..parallel import gmax, gmean, gmin, gstd

        if h.normalize_rewards:
            rev_full = jnp.concatenate([rev0[None], rev_rest], axis=0)
            new_buffer[DataKeys.REVERSED_DISCOUNTED_RETURNS] = rev_full
            reward_scale = gstd(rev_full[1:], self._axis)
        else:
            reward_scale = jnp.asarray(1.0, dtype=jnp.float32)

        returns = jnp.sum(rewards, axis=0)
        stats = {
            "returns/min": gmin(returns, self._axis),
            "returns/max": gmax(returns, self._axis),
            "returns/mean": gmean(returns, self._axis),
            "returns/std": gstd(returns, self._axis),
            "rewards/min": gmin(rewards, self._axis),
            "rewards/max": gmax(rewards, self._axis),
            "rewards/mean": gmean(rewards, self._axis),
            "rewards/std": gstd(rewards, self._axis),
            "env/was_reset": was_reset,
        }
        new_state = state.replace(
            env_state=env_state,
            rng=rng,
            buffer=new_buffer,
            horizons=state.horizons + 1,
            buffered=jnp.asarray(True),
            reward_scale=reward_scale,
            seqs=seqs,
        )
        return new_state, stats

    def collect(
        self,
        *,
        env_config: None | dict[str, Any] = None,
        deterministic: bool = False,
    ) -> CollectStats:
        """Collect transitions, threading recurrent states
        (``/root/reference/src/rl8/algorithms/_recurrent.py:325-479``)."""
        with profile_ms() as collect_timer:
            cfg_def = jax.tree_util.tree_structure(env_config)
            fn = self._get_fn(
                ("collect", deterministic, cfg_def),
                lambda: self._wrap_fn(
                    lambda state, cfg: self._collect_impl(state, cfg, deterministic),
                    (env_config,),
                ),
            )
            self.state, stats = fn(self.state, env_config)
            stats = jax.device_get(stats)
        self._horizons_host += 1
        collect_stats: CollectStats = {
            k: float(v) for k, v in stats.items() if k != "env/was_reset"
        }
        collect_stats["env/resets"] = self.hparams.num_envs * int(
            stats["env/was_reset"]
        )
        collect_stats["env/steps"] = self.hparams.num_envs * self.hparams.horizon
        collect_stats["profiling/collect_ms"] = collect_timer()
        return collect_stats

    # ------------------------------------------------------------------
    # step
    # ------------------------------------------------------------------

    def _step_impl(
        self,
        state: RecurrentAlgorithmState,
        lr: jax.Array,
        entropy_coeff: jax.Array | float,
        use_entropy: bool,
    ) -> tuple[RecurrentAlgorithmState, dict[str, jax.Array]]:
        """One fully-jitted recurrent PPO update
        (``_recurrent.py:481-652``)."""
        h = self.hparams
        B, T, L = self._impl_B, h.horizon, h.seq_len
        N = B * (T // L)
        M = h.num_minibatches
        mb_rows = N // M  # per-shard minibatch sequences
        E = h.num_sgd_iters
        accum = M if h.accumulate_grads else 1
        model = self.policy.model
        dist_cls = self.policy.distribution_cls
        buffer = state.buffer
        entropy_coeff = entropy_coeff if use_entropy else 0.0

        if self._use_pallas_gae:
            from ..ops import pallas_gae

            advantages, returns = pallas_gae(
                buffer[DataKeys.REWARDS],
                buffer[DataKeys.VALUES],
                state.reward_scale,
                gamma=h.gamma,
                gae_lambda=h.gae_lambda,
            )
        else:
            advantages, returns = generalized_advantage_estimate(
                buffer[DataKeys.REWARDS],
                buffer[DataKeys.VALUES],
                gae_lambda=h.gae_lambda,
                gamma=h.gamma,
                normalize_advantages=False,
                return_returns=True,
                reward_scale=state.reward_scale,
            )
        if h.normalize_advantages:
            from ..parallel import gmean, gstd

            advantages = (advantages - gmean(advantages, self._axis)) / (
                gstd(advantages, self._axis) + 1e-8
            )

        # Sequence minibatching (``_recurrent.py:518``): each batch element
        # is a [seq_len] chunk; its stored initial states seed the forward.
        flat = {
            DataKeys.OBS: jax.tree_util.tree_map(
                lambda x: _seq_major(x[:T], L), buffer[DataKeys.OBS]
            ),
            DataKeys.STATES: jax.tree_util.tree_map(
                lambda s: _seq_major(s[:T], L)[:, 0], buffer[DataKeys.STATES]
            ),
            DataKeys.ACTIONS: _seq_major(buffer[DataKeys.ACTIONS], L),
            DataKeys.LOGP: _seq_major(buffer[DataKeys.LOGP], L),
            DataKeys.ADVANTAGES: _seq_major(advantages, L),
            DataKeys.RETURNS: _seq_major(returns, L),
        }
        final_obs = jax.tree_util.tree_map(lambda x: x[-1], buffer[DataKeys.OBS])
        final_states = jax.tree_util.tree_map(
            lambda s: s[-1], buffer[DataKeys.STATES]
        )

        # Pack sequence rows into one [N, D] matrix: an epoch's shuffle is
        # a single gather, minibatch selection a free slice (see
        # rl8_tpu/ops/packing.py). Bit-exact round trip.
        from ..ops import pack_rows

        packed, unpack = pack_rows(flat)
        D = packed.shape[1]
        rng, perm_key = jax.random.split(state.rng)
        if self._axis is not None:
            perm_key = jax.random.fold_in(
                perm_key, jax.lax.axis_index(self._axis)
            )
        epoch_keys = jax.random.split(perm_key, E)
        apply_flags = ((jnp.arange(M) + 1) % accum) == 0

        opt_state = state.opt_state
        # Explicit dtype keeps the aval weak_type-stable across calls
        # (a weak-typed scalar here would silently retrace every step).
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
        sum_keys = ("entropy", "policy", "vf", "total", "kl_div")
        zero_sums = {k: jnp.asarray(0.0) for k in sum_keys}
        carry0 = {
            "params": state.params,
            "opt_state": opt_state,
            "grad_acc": jax.tree_util.tree_map(jnp.zeros_like, state.params),
            "stopped": jnp.asarray(False),
            "window_sums": dict(zero_sums),
            "totals": dict(zero_sums),
            "n_windows": jnp.asarray(0.0),
        }

        def _loss_fn(params: Any, mb: dict[str, Any]) -> tuple[jax.Array, Any]:
            (features, values), _ = self._apply_model(
                params,
                {DataKeys.OBS: mb[DataKeys.OBS]},
                mb[DataKeys.STATES],
            )
            # Flatten the [mb, L] buffer batch to align with [mb * L]
            # model outputs (``_recurrent.py:565``).
            flat_mb = {
                k: mb[k].reshape(-1, *mb[k].shape[2:])
                for k in (
                    DataKeys.ACTIONS,
                    DataKeys.LOGP,
                    DataKeys.ADVANTAGES,
                    DataKeys.RETURNS,
                )
            }
            dist = dist_cls(features, model)
            losses = ppo_losses(
                flat_mb,
                values,
                dist,
                clip_param=h.clip_param,
                dual_clip_param=h.dual_clip_param,
                entropy_coeff=entropy_coeff,
                vf_clip_param=h.vf_clip_param,
                vf_coeff=h.vf_coeff,
            )
            # Rank-1 [N] chain: a materialized [N, 1] intermediate pads
            # 1 -> 128 lanes on TPU (see ppo_losses).
            logp_ratio = (
                dist.logp(flat_mb[DataKeys.ACTIONS]).reshape(-1)
                - flat_mb[DataKeys.LOGP].reshape(-1)
            )
            kl = jnp.mean((jnp.exp(logp_ratio) - 1) - logp_ratio)
            kl = jax.lax.stop_gradient(kl)
            return losses["total"] / accum, (losses, kl)

        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)

        if self._fused_update:
            from ..ops.fused_ppo import PPOLossConfig

            ppo_cfg = PPOLossConfig(
                clip_param=h.clip_param,
                vf_clip_param=h.vf_clip_param,
                vf_coeff=h.vf_coeff,
                dual_clip_param=h.dual_clip_param,
                n_rows=mb_rows,
                accum=accum,
                use_entropy=use_entropy,
                squashed=self._squashed_dist,
            )

        def _minibatch(carry: dict[str, Any], xs: Any) -> tuple[dict[str, Any], None]:
            mb_packed, apply_flag = xs

            def _process(carry: dict[str, Any]) -> dict[str, Any]:
                if self._fused_update:
                    from ..ops.fused_rnn_ppo import fused_rnn_ppo_grads

                    losses, kl, grads = fused_rnn_ppo_grads(
                        model, carry["params"], mb_packed, unpack,
                        entropy_coeff, ppo_cfg,
                    )
                else:
                    mb = unpack(mb_packed)
                    (_, (losses, kl)), grads = grad_fn(carry["params"], mb)
                if self._axis is not None:
                    from ..parallel import pmean_tree

                    losses, kl, grads = pmean_tree(
                        (losses, kl, grads), self._axis
                    )
                trigger = (
                    kl > 1.5 * h.target_kl_div
                    if h.target_kl_div is not None
                    else jnp.asarray(False)
                )
                scaled = {
                    k: losses[k] / accum for k in ("entropy", "policy", "vf", "total")
                }
                scaled["kl_div"] = kl / accum
                window_sums = {
                    k: carry["window_sums"][k] + scaled[k] for k in sum_keys
                }
                grad_acc = jax.tree_util.tree_map(
                    lambda a, g: a + g, carry["grad_acc"], grads
                )

                def _apply(args: Any) -> Any:
                    params, opt_state, grad_acc, window_sums, totals, n = args

                    def _update(_: None) -> tuple[Any, Any]:
                        updates, new_opt = self.optimizer.update(
                            grad_acc, opt_state, params
                        )
                        return optax.apply_updates(params, updates), new_opt

                    def _skip_update(_: None) -> tuple[Any, Any]:
                        return params, opt_state

                    params, opt_state = jax.lax.cond(
                        trigger, _skip_update, _update, None
                    )
                    totals = {k: totals[k] + window_sums[k] for k in sum_keys}
                    return (
                        params,
                        opt_state,
                        jax.tree_util.tree_map(jnp.zeros_like, grad_acc),
                        dict(zero_sums),
                        totals,
                        n + 1.0,
                    )

                def _no_apply(args: Any) -> Any:
                    return args

                params, opt_state, grad_acc, window_sums, totals, n = jax.lax.cond(
                    apply_flag,
                    _apply,
                    _no_apply,
                    (
                        carry["params"],
                        carry["opt_state"],
                        grad_acc,
                        window_sums,
                        carry["totals"],
                        carry["n_windows"],
                    ),
                )
                return {
                    "params": params,
                    "opt_state": opt_state,
                    "grad_acc": grad_acc,
                    "stopped": carry["stopped"] | trigger,
                    "window_sums": window_sums,
                    "totals": totals,
                    "n_windows": n,
                }

            carry = jax.lax.cond(carry["stopped"], lambda c: c, _process, carry)
            return carry, None

        def _epoch(
            carry: dict[str, Any], epoch_key: jax.Array
        ) -> tuple[dict[str, Any], None]:
            def _run(carry: dict[str, Any]) -> dict[str, Any]:
                # The shuffle gather is skipped when the epoch's result
                # is permutation-invariant: with one minibatch per epoch
                # trivially, and under full-epoch gradient accumulation
                # (accum == M: one optimizer apply per epoch, so the
                # epoch gradient and its loss stats are sums over ALL
                # rows regardless of how minibatches partition them —
                # only fp summation order differs).
                if h.shuffle_minibatches and M > 1 and accum == 1:
                    # Permute fixed blocks of consecutive rows instead of
                    # single rows: TPU gathers pay a fixed per-row cost,
                    # so fetching blk-row blocks cuts the shuffle's cost
                    # ~blk-fold. blk divides mb_rows, so minibatch
                    # boundaries never split a block; blk=1 is the
                    # reference's exact row-level shuffle (PARITY.md).
                    from ..ops import block_shuffle

                    blk = math.gcd(h.effective_shuffle_block, mb_rows)
                    shuffled = block_shuffle(packed, epoch_key, blk)
                else:
                    shuffled = packed
                mbs = shuffled.reshape(M, mb_rows, D)
                carry, _ = jax.lax.scan(_minibatch, carry, (mbs, apply_flags))
                return carry

            carry = jax.lax.cond(carry["stopped"], lambda c: c, _run, carry)
            return carry, None

        carry, _ = jax.lax.scan(_epoch, carry0, epoch_keys)

        n = jnp.maximum(carry["n_windows"], 1.0)
        stats = {
            "losses/entropy": carry["totals"]["entropy"] / n,
            "losses/policy": carry["totals"]["policy"] / n,
            "losses/vf": carry["totals"]["vf"] / n,
            "losses/total": carry["totals"]["total"] / n,
            "monitors/kl_div": carry["totals"]["kl_div"] / n,
        }

        # Reset the buffer, restoring final obs AND final states
        # (``_recurrent.py:638-647``).
        new_buffer = jax.tree_util.tree_map(jnp.zeros_like, buffer)
        new_buffer[DataKeys.OBS] = jax.tree_util.tree_map(
            lambda z, o: z.at[-1].set(o), new_buffer[DataKeys.OBS], final_obs
        )
        new_buffer[DataKeys.STATES] = jax.tree_util.tree_map(
            lambda z, s: z.at[-1].set(s), new_buffer[DataKeys.STATES], final_states
        )
        new_state = state.replace(
            params=carry["params"],
            opt_state=carry["opt_state"],
            rng=rng,
            buffer=new_buffer,
            buffered=jnp.asarray(False),
        )
        return new_state, stats

    def step(self) -> StepStats:
        """Update the policy using the collected buffer
        (``/root/reference/src/rl8/algorithms/_recurrent.py:481-652``)."""
        if not bool(jax.device_get(self.state.buffered)):
            raise RuntimeError(
                f"{self.__class__.__name__} has no buffered rollout to train"
                " on — every `step` must be preceded by a `collect`."
            )
        with profile_ms() as step_timer:
            entropy_coeff = (
                0.0 if self._static_zero_entropy else self.entropy_scheduler.coeff
            )
            use_entropy = not self._static_zero_entropy
            fn = self._get_fn(
                ("step", use_entropy),
                lambda: self._wrap_fn(
                    lambda state, lr, ec: self._step_impl(state, lr, ec, use_entropy),
                    (0.0, 0.0),
                ),
            )
            self.state, stats = fn(
                self.state,
                self.lr_scheduler.coeff,
                jnp.asarray(entropy_coeff, dtype=jnp.float32),
            )
            stats = {k: float(v) for k, v in jax.device_get(stats).items()}
            count = self.hparams.num_envs * self._horizons_host
            self.lr_scheduler.step(count)
            self.entropy_scheduler.step(count)
        step_stats: StepStats = {
            "coefficients/entropy": float(entropy_coeff),
            "coefficients/vf": self.hparams.vf_coeff,
            **stats,
        }
        step_stats["profiling/step_ms"] = step_timer()
        return step_stats

    def _train_impl(
        self,
        state: RecurrentAlgorithmState,
        lrs: jax.Array,
        entropy_coeffs: jax.Array,
        env_config: None | dict[str, Any],
        num_steps: int,
        use_entropy: bool,
    ) -> tuple[RecurrentAlgorithmState, dict[str, jax.Array]]:
        """``num_steps`` collect+step iterations as ONE compiled program
        (see ``Algorithm._train_impl`` for rationale)."""

        def _body(
            state: RecurrentAlgorithmState, xs: tuple[jax.Array, jax.Array]
        ) -> tuple[RecurrentAlgorithmState, dict[str, jax.Array]]:
            lr, entropy_coeff = xs
            state, collect_stats = self._collect_impl(state, env_config, False)
            state, step_stats = self._step_impl(
                state, lr, entropy_coeff, use_entropy
            )
            return state, {**collect_stats, **step_stats}

        return jax.lax.scan(_body, state, (lrs, entropy_coeffs), length=num_steps)

    def train_steps(
        self,
        num_steps: int,
        /,
        *,
        env_config: None | dict[str, Any] = None,
    ) -> list[dict[str, float]]:
        """Run ``num_steps`` fused collect+step iterations on device,
        returning per-iteration train stats (see
        ``Algorithm.train_steps``)."""
        if num_steps <= 0:
            raise ValueError("`num_steps` must be > 0.")
        with profile_ms() as timer:
            lrs, ents = [], []
            for i in range(num_steps):
                lrs.append(self.lr_scheduler.coeff)
                ents.append(
                    0.0
                    if self._static_zero_entropy
                    else self.entropy_scheduler.coeff
                )
                count = self.hparams.num_envs * (self._horizons_host + i + 1)
                self.lr_scheduler.step(count)
                self.entropy_scheduler.step(count)
            use_entropy = not self._static_zero_entropy
            cfg_def = jax.tree_util.tree_structure(env_config)
            fn = self._get_fn(
                ("train", num_steps, use_entropy, cfg_def),
                lambda: self._wrap_fn(
                    lambda state, lrs, ents, cfg: self._train_impl(
                        state, lrs, ents, cfg, num_steps, use_entropy
                    ),
                    (jnp.zeros(num_steps), jnp.zeros(num_steps), env_config),
                ),
            )
            self.state, stats = fn(
                self.state,
                jnp.asarray(lrs, dtype=jnp.float32),
                jnp.asarray(ents, dtype=jnp.float32),
                env_config,
            )
            stats = jax.device_get(stats)
        self._horizons_host += num_steps
        elapsed_ms = timer()
        out: list[dict[str, float]] = []
        for i in range(num_steps):
            record = {
                k: float(v[i]) for k, v in stats.items() if k != "env/was_reset"
            }
            record["env/resets"] = self.hparams.num_envs * int(
                stats["env/was_reset"][i]
            )
            record["env/steps"] = self.hparams.num_envs * self.hparams.horizon
            record["coefficients/entropy"] = float(ents[i])
            record["coefficients/vf"] = self.hparams.vf_coeff
            record["profiling/train_ms"] = elapsed_ms / num_steps
            out.append(record)
        return out

    def validate(self) -> None:
        """Validate env/policy/buffer shape contracts with one real
        reset→sample→step round trip
        (``/root/reference/src/rl8/algorithms/_recurrent.py:654-756``).

        Runs as a SINGLE jitted program — eager execution would pay one
        remote XLA compile per op on TPU toolchains (see the
        feedforward ``validate`` docstring)."""
        B = self.hparams.num_envs

        def _probe(params: Any, key: jax.Array):
            env_state, obs = self.env.reset(key)
            states = self.policy.init_states(B)
            batch = {
                DataKeys.OBS: jax.tree_util.tree_map(
                    lambda o: o[:, None], obs
                )
            }
            sample, new_states = self.policy.sample(
                params,
                batch,
                states,
                key=key,
                deterministic=False,
                return_actions=True,
                return_logp=True,
                return_values=True,
            )
            env_state, next_obs, rewards = self.env.step(
                env_state, sample[DataKeys.ACTIONS]
            )
            return obs, sample, new_states, next_obs, rewards

        obs, sample, new_states, next_obs, rewards = jax.jit(_probe)(
            self.state.params, jax.random.key(0)
        )
        self.env.observation_spec.assert_is_in(obs)
        actions = sample[DataKeys.ACTIONS]
        assert jnp.ndim(actions) >= 2, (
            "Actions must be at least 2D and have shape ``[N, ...]``."
        )
        self.env.action_spec.assert_is_in(actions)
        assert sample[DataKeys.LOGP].shape == (B, 1), (
            "Action log probabilities must be 2D with shape ``[N, 1]``."
        )
        assert sample[DataKeys.VALUES].shape == (B, 1), (
            "Value estimates must be 2D with shape ``[N, 1]``."
        )
        flat_states = jax.tree_util.tree_leaves(new_states)
        for leaf in flat_states:
            assert leaf.shape[0] == B, (
                "Recurrent states must keep the batch dimension ``[N, ...]``."
            )
        self.env.observation_spec.assert_is_in(next_obs)
        assert rewards.shape == (B, 1), "Rewards must be 2D with shape ``[N, 1]``."
