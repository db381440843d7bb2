"""Feedforward PPO algorithm.

TPU-native redesign of
``/root/reference/src/rl8/algorithms/_feedforward.py``. The reference's
hot loops are Python-level: ``collect`` steps the env ``horizon`` times
from the interpreter (``_feedforward.py:359-393``) and ``step`` iterates
minibatches eagerly (``:512-596``). Here each is ONE jitted XLA program:

- ``collect`` = ``lax.cond`` (reset-vs-carry, ``:336-357``) + a
  ``lax.scan`` over the horizon fusing policy sampling, env stepping,
  reward-normalization bookkeeping (``:378-383``), and buffer writes;
- ``step`` = a GAE scan (``nn/functional.py:50-123``) + one ``lax.scan``
  over ``num_sgd_iters x num_minibatches`` fusing gather, forward, loss
  (``nn/functional.py:259-363``), KL early-stop masking (``:577-582``),
  gradient accumulation, clipping, and the optimizer update.

The rollout buffer is a *time-major* ``[T, B, ...]`` pytree (scan's
natural layout) instead of the reference's ``[B, T+1]`` TensorDict; it is
transposed once per step for minibatching. All dynamic state (params,
optimizer state, env state, RNG, counters, reward scale) lives in an
:class:`rl8_tpu.data.AlgorithmState` pytree so the entire train loop is
a pure function — which is also what makes multi-chip sharding (see
``rl8_tpu.parallel``) a matter of input placement rather than code.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..data import AlgorithmHparams, AlgorithmState, CollectStats, DataKeys, StepStats
from ..distributions import Distribution
from ..env import EnvFactory
from ..models import Model, ModelFactory
from ..nn import generalized_advantage_estimate, ppo_losses
from ..policies import Policy
from ..schedulers import EntropyScheduler, LRScheduler, ScheduleKind
from ..specs import assert_nd_spec
from ..utils import get_nested as _tree_get
from ..utils import profile_ms
from ..utils import set_nested as _set_nested
from ._base import GenericAlgorithmBase

__all__ = ["AlgorithmConfig", "Algorithm"]


@dataclass
class AlgorithmConfig:
    """Config for building a feedforward PPO algorithm.

    Field-for-field counterpart of
    ``/root/reference/src/rl8/algorithms/_feedforward.py:29-179`` with
    TPU-native replacements: ``optimizer_cls`` takes an optax factory,
    ``enable_amp`` switches default models to bf16 compute (no loss
    scaling is needed on TPU), ``device`` is replaced by an optional
    ``mesh`` for multi-chip sharding, and ``seed`` makes RNG explicit.
    """

    #: Model instance to use. Mutually exclusive with ``model_cls``.
    model: None | Model = None
    #: Custom policy model class/factory; inferred from specs if omitted.
    model_cls: None | ModelFactory = None
    #: Model kwargs unpacked into the model at instantiation.
    model_config: None | dict[str, Any] = None
    #: Custom action distribution class; inferred from the action spec.
    distribution_cls: None | type[Distribution] = None
    #: Number of transitions per :meth:`Algorithm.collect` call.
    horizon: int = 32
    #: Collects between env resets; negative = reset only once.
    horizons_per_env_reset: int = 1
    #: Number of parallelized environment instances.
    num_envs: int = 8192
    #: Optax optimizer factory (first arg: learning rate).
    optimizer_cls: Callable[..., optax.GradientTransformation] = optax.adam
    #: Optimizer kwargs; ``{"lr": 1e-3}`` by default.
    optimizer_config: None | dict[str, Any] = None
    #: Accumulate gradients across minibatches before stepping.
    accumulate_grads: bool = False
    #: bf16 mixed precision for default models' compute.
    enable_amp: bool = False
    #: Optional LR schedule over environment transition counts.
    lr_schedule: None | list[tuple[int, float]] = None
    lr_schedule_kind: ScheduleKind = "step"
    #: Entropy coefficient (ignored when a schedule is given).
    entropy_coeff: float = 0.0
    entropy_coeff_schedule: None | list[tuple[int, float]] = None
    entropy_coeff_schedule_kind: ScheduleKind = "step"
    #: GAE lambda.
    gae_lambda: float = 0.95
    #: Discount factor.
    gamma: float = 0.95
    #: Minibatch size; ``None`` = the whole buffer.
    sgd_minibatch_size: None | int = None
    #: SGD epochs over the buffer per step.
    num_sgd_iters: int = 4
    #: Shuffle minibatches each epoch.
    shuffle_minibatches: bool = True
    #: Rows per shuffle unit: each epoch permutes blocks of this many
    #: consecutive buffer rows instead of single rows. TPU gathers pay a
    #: fixed per-row cost, so 8-row blocks make the per-epoch shuffle
    #: ~8x cheaper (a multi-ms cost at tracked shapes); blocks are
    #: clamped to divide the minibatch size. ``1`` restores the
    #: reference's exact row-level uniform shuffle (PARITY.md records
    #: the deviation).
    shuffle_block_rows: int = 8
    #: PPO clip parameter.
    clip_param: float = 0.2
    #: Value-function clip parameter.
    vf_clip_param: float = 5.0
    #: Dual clip for negative advantages (``None`` disables).
    dual_clip_param: None | float = None
    #: Value-function loss weight.
    vf_coeff: float = 1.0
    #: Early-stop epochs when approximate KL exceeds 1.5x this.
    target_kl_div: None | float = None
    #: Global gradient norm clip.
    max_grad_norm: float = 5.0
    #: Standardize advantages per batch.
    normalize_advantages: bool = True
    #: Normalize rewards by the std of reversed discounted returns.
    normalize_rewards: bool = True
    #: Run the optimizer over a single flattened parameter vector (one
    #: fused update instead of ~100 tiny per-leaf kernels). Bit-identical
    #: for elementwise optimizers (adam/sgd/...); disable for optimizers
    #: whose math depends on parameter structure.
    flatten_optimizer: bool = True
    #: Evaluate supported models with fused Pallas forward/backward
    #: kernels on TPU (recompute-based backward): default models, and
    #: custom models declaring a ``FusedApplySpec``
    #: (``Model.fused_apply_spec``). Equals the flax forward up to
    #: matmul precision (bf16 multiplies — XLA's own TPU default).
    #: Off by default for the default models (XLA's fusion of the plain
    #: flax module currently matches these kernels); the payoff is on
    #: spec-declaring custom models, whose autodiff update is otherwise
    #: HBM-traffic-bound. Auto-disabled for unsupported models or
    #: activations, chains exceeding the kernels' VMEM budget, and GSPMD
    #: exact-sharding mode (the default shard_map mode keeps it
    #: available per shard).
    fused_forward: bool = False
    #: Compute each PPO minibatch's losses AND parameter gradients with
    #: ONE fused Pallas kernel (forward, distribution log-probs/entropy,
    #: dual-clip surrogate + clamped smooth-L1 value loss, hand-derived
    #: backward — all in VMEM; see ``ops/fused_ppo.py``). Matches the
    #: autodiff path to matmul (bf16-multiply) precision. Auto-disabled
    #: for custom models/distributions and in GSPMD exact-sharding mode
    #: (the default shard_map mode runs it per shard).
    fused_update: bool = True
    #: Sample rollout actions/log-probs/values with ONE fused Pallas
    #: kernel per step (see ``ops/fused_act.py``). Uses the TPU hardware
    #: PRNG, so rollouts differ bit-wise from the unfused path at equal
    #: seeds while following identical distributions. Same auto-disable
    #: conditions as ``fused_update``.
    fused_act: bool = True
    #: PRNG seed for params, sampling, env resets, and shuffling.
    seed: int = 0
    #: Optional device mesh with an ``"env"`` axis for sharding the env
    #: batch (data parallelism). ``None`` = single device.
    mesh: Any = None
    #: Sharded execution mode. ``False`` (default): ``shard_map`` with
    #: explicit collectives — each device runs the fused per-shard
    #: program (Pallas kernels stay enabled) with per-shard RNG streams
    #: and gradient/stat ``pmean`` over ICI; batch statistics (advantage
    #: normalization, reward scale, return stats) remain GLOBAL.
    #: ``True``: GSPMD auto-partitioning of the global program —
    #: bit-identical to single-device execution at equal seeds (useful
    #: for debugging), but fused kernels are disabled.
    exact_sharding: bool = False

    def build(self, env_cls: EnvFactory) -> "Algorithm":
        """Build and validate an :class:`Algorithm` from this config."""
        algo = Algorithm(env_cls, config=self)
        algo.validate()
        return algo


def _t2b(x: jax.Array) -> jax.Array:
    """Time-major ``[T, B, ...]`` -> flat batch ``[B * T, ...]`` with
    B-major ordering (matching the reference's ``buffer.reshape(-1)``)."""
    moved = jnp.swapaxes(x, 0, 1)
    return moved.reshape(-1, *moved.shape[2:])


#: Non-observation buffer keys a model's view requirements may window
#: (the reference applies views over the whole buffer batch;
#: ``/root/reference/src/rl8/policies/_feedforward.py:135-138``).
_VIEWABLE_NONOBS_KEYS = (
    DataKeys.ACTIONS,
    DataKeys.REWARDS,
    DataKeys.LOGP,
    DataKeys.VALUES,
)




class Algorithm(GenericAlgorithmBase[AlgorithmHparams, AlgorithmState, Policy]):
    """An optimized feedforward PPO algorithm with common tricks for
    stabilizing and accelerating learning, compiled end-to-end for TPU.

    Args:
        env_cls: Highly parallelized environment factory. Stepped
            ``horizon`` times per :meth:`collect`.
        config: See :class:`AlgorithmConfig`.

    Examples:
        >>> from rl8_tpu import AlgorithmConfig
        >>> from rl8_tpu.env import DiscreteDummyEnv
        >>> algo = AlgorithmConfig(
        ...     num_envs=4, horizon=4, model_config={"hiddens": (8,)}
        ... ).build(DiscreteDummyEnv)
        >>> collect_stats = algo.collect()
        >>> int(collect_stats["env/steps"])
        16
        >>> step_stats = algo.step()
        >>> "losses/total" in step_stats
        True

    """

    def __init__(
        self, env_cls: EnvFactory, /, config: None | AlgorithmConfig = None
    ) -> None:
        config = config or AlgorithmConfig()
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
        self.policy = Policy(
            self.env.observation_spec,
            self.env.action_spec,
            model=config.model,
            model_cls=config.model_cls,
            model_config=model_config,
            distribution_cls=config.distribution_cls,
        )
        self.policy.model.validate_view_requirements()
        if self.policy.model.drop_size:
            raise RuntimeError(
                "Models with sample-dropping view requirements can't align"
                " training views with the rollout buffer. Use"
                " `padded_rolling_window` (drop size 0) views instead."
            )
        self._nonobs_view_roots  # fail fast on invalid view keys

        sgd_minibatch_size = (
            config.sgd_minibatch_size
            if config.sgd_minibatch_size is not None
            else num_envs * horizon
        )
        self.hparams = AlgorithmHparams(
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
        #: Whether the entropy bonus is statically absent (lets
        #: SquashedNormal policies train without defined entropy).
        self._static_zero_entropy = (
            config.entropy_coeff_schedule is None and config.entropy_coeff == 0.0
        )

        rng = jax.random.key(config.seed)
        rng, params_key, reset_key = jax.random.split(rng, 3)
        # Parameter init needs concrete shapes for ``flatten_optimizer``
        # below but no device execution: eval_shape traces it for free,
        # and the real init runs inside the single jitted ``_init``
        # program. Eager flax init would dispatch every layer op as its
        # own XLA program — measured 71 s eager vs 3.7 s jitted for the
        # AttentiveAlpaca example on a remote-compile TPU toolchain.
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
            # Throwaway reset materializes the env-state pytree
            # structure; the first `collect` re-resets per the reset
            # cadence.
            env_state, _ = self.env.reset(reset_key)
            return params, opt_state, env_state, self._zero_buffer()

        params, opt_state, env_state, buffer = jax.jit(_init)(
            params_key, reset_key
        )
        self.state = AlgorithmState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            rng=rng,
            buffer=buffer,
            horizons=jnp.asarray(0, dtype=jnp.int32),
            buffered=jnp.asarray(False),
            reward_scale=jnp.asarray(1.0, dtype=jnp.float32),
        )
        self._init_sharding(
            env_cls, config.mesh, config.exact_sharding,
            num_envs, horizon, sgd_minibatch_size,
        )
        sharded_exact = self.mesh is not None and self._axis is None
        #: Host mirror of ``state.horizons`` for scheduler stepping.
        self._horizons_host = 0
        # Fused Pallas kernels run per shard under shard_map but can't be
        # auto-partitioned by GSPMD, so the exact-sharding mode (and CPU)
        # falls back to the XLA implementations.
        on_tpu = jax.local_devices()[0].platform == "tpu"
        from ..ops.gae import gae_fits_vmem

        self._use_pallas_gae = (
            on_tpu and not sharded_exact and gae_fits_vmem(self.hparams.horizon)
        )
        from ..ops.fused_mlp import model_fits_vmem, supports_fused_apply
        from ..ops.fused_ppo import supports_fused_update

        # The fused kernels hold the full parameter set (and its gradient
        # accumulators) VMEM-resident; very wide models fall back to the
        # XLA autodiff path instead of failing Mosaic allocation.
        fused_fits = supports_fused_apply(self.policy.model) and model_fits_vmem(
            self.policy.model, self.state.params
        )
        #: Fused Pallas model forward/backward (see ``ops/fused_mlp.py``).
        self._fused_forward = (
            config.fused_forward and not sharded_exact and on_tpu and fused_fits
        )
        #: Fully-fused PPO update kernel (see ``ops/fused_ppo.py``):
        #: forward + losses + backward in one Pallas kernel per minibatch.
        from ..distributions import SquashedNormal

        #: Whether the action distribution squashes through tanh (the
        #: fused kernels need the logp/sampling variant).
        self._squashed_dist = self.policy.distribution_cls is SquashedNormal
        fused_update_ok = (
            supports_fused_update(
                self.policy.model,
                self.policy.distribution_cls,
                zero_entropy=self._static_zero_entropy,
            )
            and fused_fits
        )
        self._fused_update = (
            config.fused_update and not sharded_exact and on_tpu and fused_update_ok
        )
        #: Fused rollout sampling kernel (see ``ops/fused_act.py``).
        self._fused_act = (
            config.fused_act and not sharded_exact and on_tpu and fused_update_ok
        )

    # ------------------------------------------------------------------
    # Model application
    # ------------------------------------------------------------------

    def _apply_model(
        self, params: Any, batch: Any
    ) -> tuple[dict[str, jax.Array], jax.Array]:
        """Model forward: fused Pallas kernels on TPU for default models
        and for custom models declaring a ``FusedApplySpec``, the flax
        module otherwise."""
        if self._fused_forward:
            from ..models import DefaultContinuousModel, DefaultDiscreteModel
            from ..ops.fused_mlp import fused_custom_apply, fused_default_apply

            if type(self.policy.model) in (
                DefaultDiscreteModel,
                DefaultContinuousModel,
            ):
                return fused_default_apply(self.policy.model, params, batch)
            return fused_custom_apply(self.policy.model, params, batch)
        return self.policy.model.apply({"params": params}, batch)

    # ------------------------------------------------------------------
    # Buffer helpers
    # ------------------------------------------------------------------

    def _zero_buffer(self, num_envs: None | int = None) -> dict[str, Any]:
        """Time-major rollout buffer counterpart of the reference's
        ``buffer_spec.zero([num_envs, horizon + 1])``
        (``_feedforward.py:239-256``). ``num_envs`` overrides the batch
        size (``validate()`` builds a tiny one instead of materializing
        a full-size transient)."""
        B = self.hparams.num_envs if num_envs is None else num_envs
        T = self.hparams.horizon
        buf: dict[str, Any] = {
            DataKeys.OBS: self.env.observation_spec.zero((T + 1, B)),
            DataKeys.REWARDS: jnp.zeros((T, B, 1)),
            DataKeys.ACTIONS: self.env.action_spec.zero((T, B)),
            DataKeys.LOGP: jnp.zeros((T, B, 1)),
            DataKeys.VALUES: jnp.zeros((T + 1, B, 1)),
        }
        if self.hparams.normalize_rewards:
            buf[DataKeys.REVERSED_DISCOUNTED_RETURNS] = jnp.zeros((T + 1, B, 1))
        return buf

    @property
    def _max_shift(self) -> int:
        return max(
            (vr.shift for vr in self.policy.model.view_requirements.values()),
            default=0,
        )

    @property
    def _nonobs_view_roots(self) -> tuple[str, ...]:
        """Non-observation buffer keys referenced by the model's view
        requirements, in declaration order.

        The reference applies view requirements over the WHOLE buffer
        batch (``/root/reference/src/rl8/policies/_feedforward.py:135-138``),
        so a custom model may window past actions/rewards/log-probs/
        values in addition to observations.
        """
        roots: dict[str, None] = {}
        for key in self.policy.model.view_requirements:
            root = key if isinstance(key, str) else (key[0] if key else "")
            if root == DataKeys.OBS:
                continue
            if isinstance(key, tuple):
                raise RuntimeError(
                    f"View requirement key {key!r} is invalid: nested keys"
                    " may only reference observations."
                )
            if root not in _VIEWABLE_NONOBS_KEYS:
                raise RuntimeError(
                    f"View requirement key {key!r} does not reference a"
                    f" rollout buffer entry (one of"
                    f" {(DataKeys.OBS, *_VIEWABLE_NONOBS_KEYS)})."
                )
            roots[root] = None
        return tuple(roots)

    def _zero_view_slot(self, root: str) -> jax.Array:
        """Per-env zero value ``[B, ...]`` for a non-obs buffer key — the
        buffer slot a ``kind="last"`` sample sees at the current timestep
        (it is written only after sampling, so the reference's view reads
        the zero-initialized entry; ``_feedforward.py:359-393``)."""
        B = self._impl_B
        if root == DataKeys.ACTIONS:
            return self._impl_env.action_spec.zero((B,))
        return jnp.zeros((B, 1))

    def _init_nonobs_windows(self) -> dict[str, jax.Array]:
        """Zero-initialized carried windows ``[B, S, ...]`` of the last
        ``S = _max_shift`` written values per non-obs view root (empty
        when every non-obs requirement has ``shift == 0``)."""
        S = self._max_shift
        if S == 0:
            return {}
        return {
            root: jnp.repeat(
                self._zero_view_slot(root)[:, None], S, axis=1
            )
            for root in self._nonobs_view_roots
        }

    @staticmethod
    def _advance_nonobs_windows(
        nonobs: dict[str, jax.Array], written: dict[str, jax.Array]
    ) -> dict[str, jax.Array]:
        """Shift each carried window left and append this step's written
        value (action taken, reward received, ...)."""
        return {
            root: jnp.concatenate(
                [w[:, 1:], written[root][:, None]], axis=1
            )
            for root, w in nonobs.items()
        }

    def _training_view_batch(self, buffer: dict[str, Any]) -> dict[str, Any]:
        """Time-major buffer ``[T(+1), B, ...]`` -> the ``[B, T, ...]``
        batch the model's ``kind="all"`` view requirements consume (obs
        plus any windowed non-obs keys) — the single definition shared
        by the training step and :meth:`validate`."""
        T = self.hparams.horizon
        batch: dict[str, Any] = {
            DataKeys.OBS: jax.tree_util.tree_map(
                lambda x: jnp.swapaxes(x[:T], 0, 1), buffer[DataKeys.OBS]
            )
        }
        for root in self._nonobs_view_roots:
            batch[root] = jnp.swapaxes(buffer[root][:T], 0, 1)
        return batch

    def _build_last_views(
        self,
        window: Any,
        valid: jax.Array,
        nonobs: dict[str, jax.Array] | None = None,
    ) -> dict[str, Any]:
        """Build the model input for a ``kind="last"`` sample from the
        carried observation window ``[B, S + 1, ...]``, its validity
        mask ``[S + 1]``, and the non-obs windows ``[B, S, ...]``.

        Equivalent to the reference's per-step
        ``apply_view_requirements(buffer[:, :t+1], kind="last")``
        (``policies/_feedforward.py:135-138``): the obs window holds the
        last ``S + 1`` observations of the current horizon, zero-padded
        (and mask-flagged) before the horizon's first observation. A
        non-obs window's final slot is the CURRENT timestep's buffer
        entry, which is still zero at sampling time (the reference
        writes actions/rewards/etc. into the buffer only after
        sampling), so views of those keys end in a zero slot.
        """
        B = self._impl_B
        nonobs = nonobs or {}
        out: dict[str, Any] = {}
        for key, vr in self.policy.model.view_requirements.items():
            size = vr.shift + 1
            if key == DataKeys.OBS or (
                isinstance(key, tuple) and key and key[0] == DataKeys.OBS
            ):
                item = (
                    window
                    if key == DataKeys.OBS
                    else _tree_get(window, key[1:])
                )
                if vr.shift == 0:
                    view = jax.tree_util.tree_map(lambda t: t[:, -1], item)
                else:
                    # __init__ rejects models with sample-dropping view
                    # requirements, so every windowed view here is the
                    # padded kind.
                    assert vr.drop_size == 0
                    tail = jax.tree_util.tree_map(lambda t: t[:, -size:], item)
                    mask = jnp.broadcast_to(~valid[-size:], (B, size))
                    view = jax.tree_util.tree_map(
                        lambda t: {
                            DataKeys.INPUTS: t,
                            DataKeys.PADDING_MASK: mask,
                        },
                        tail,
                    )
            else:
                zero_slot = self._zero_view_slot(key)
                if vr.shift == 0:
                    view = zero_slot
                else:
                    assert vr.drop_size == 0
                    w = nonobs[key]
                    tail = jnp.concatenate(
                        [w[:, w.shape[1] - vr.shift :], zero_slot[:, None]],
                        axis=1,
                    )
                    mask = jnp.broadcast_to(~valid[-size:], (B, size))
                    view = {
                        DataKeys.INPUTS: tail,
                        DataKeys.PADDING_MASK: mask,
                    }
            _set_nested(out, key, view)
        return out

    # ------------------------------------------------------------------
    # collect
    # ------------------------------------------------------------------

    def _collect_impl(
        self,
        state: AlgorithmState,
        env_config: None | dict[str, Any],
        deterministic: bool,
    ) -> tuple[AlgorithmState, dict[str, jax.Array]]:
        """One fully-jitted rollout (``_feedforward.py:301-441``)."""
        h = self.hparams
        B, T = self._impl_B, h.horizon  # B is per-shard under shard_map
        S = self._max_shift
        env = self._impl_env
        model = self.policy.model
        dist_cls = self.policy.distribution_cls
        buffer = state.buffer

        rng, reset_key, scan_key = jax.random.split(state.rng, 3)
        if self._axis is not None:
            # Per-shard env/sampling streams; the carried ``state.rng``
            # advances identically everywhere (stays replicated).
            shard = jax.lax.axis_index(self._axis)
            reset_key = jax.random.fold_in(reset_key, shard)
            scan_key = jax.random.fold_in(scan_key, shard)

        # --- initial obs: reset vs carry (``_feedforward.py:336-357``).
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

        # --- observation window carry (last S + 1 obs of this horizon).
        window0 = jax.tree_util.tree_map(
            lambda o: jnp.zeros((B, S + 1, *o.shape[1:]), o.dtype)
            .at[:, -1]
            .set(o),
            obs0,
        )
        valid0 = jnp.zeros((S + 1,), dtype=bool).at[-1].set(True)
        nonobs0 = self._init_nonobs_windows()

        def _scan_step(carry: Any, key: jax.Array) -> tuple[Any, Any]:
            env_state, window, valid, nonobs, rev = carry
            in_batch = self._build_last_views(window, valid, nonobs)
            if self._fused_act:
                from ..ops.fused_act import fused_act

                actions, logp, values = fused_act(
                    model, state.params, in_batch, key,
                    deterministic=deterministic,
                    squashed=self._squashed_dist,
                )
            else:
                features, values = self._apply_model(state.params, in_batch)
                dist = dist_cls(features, model)
                if deterministic:
                    actions = dist.deterministic_sample()
                else:
                    actions = dist.sample(key)
                logp = dist.logp(actions)
            env_state, obs_next, rewards = env.step(env_state, actions)
            rev_next = h.gamma * rev + rewards if h.normalize_rewards else rev
            window_next = jax.tree_util.tree_map(
                lambda w, o: jnp.concatenate([w[:, 1:], o[:, None]], axis=1),
                window,
                obs_next,
            )
            valid_next = jnp.concatenate(
                [valid[1:], jnp.ones((1,), dtype=bool)], axis=0
            )
            nonobs_next = self._advance_nonobs_windows(
                nonobs,
                {
                    DataKeys.ACTIONS: actions,
                    DataKeys.REWARDS: rewards,
                    DataKeys.LOGP: logp,
                    DataKeys.VALUES: values,
                },
            )
            return (
                (env_state, window_next, valid_next, nonobs_next, rev_next),
                (obs_next, actions, logp, values, rewards, rev_next),
            )

        keys = jax.random.split(scan_key, T)
        (env_state, window, valid, nonobs, _), ys = jax.lax.scan(
            _scan_step, (env_state, window0, valid0, nonobs0, rev0), keys
        )
        obs_rest, actions, logp, values, rewards, rev_rest = ys

        # --- bootstrap value at the final observation (``:395-408``).
        in_batch = self._build_last_views(window, valid, nonobs)
        _, v_last = self._apply_model(state.params, in_batch)

        obs_full = jax.tree_util.tree_map(
            lambda first, rest: jnp.concatenate([first[None], rest], axis=0),
            obs0,
            obs_rest,
        )
        values_full = jnp.concatenate([values, v_last[None]], axis=0)
        # f32 casts pin the buffer template's dtypes: a custom model or
        # distribution computing in bf16 must not change the dtype of
        # the scan-carried buffer (train_steps' lax.scan carry would
        # type-mismatch between trace-in and trace-out).
        new_buffer: dict[str, Any] = {
            DataKeys.OBS: obs_full,
            DataKeys.REWARDS: rewards.astype(jnp.float32),
            DataKeys.ACTIONS: actions,
            DataKeys.LOGP: logp.astype(jnp.float32),
            DataKeys.VALUES: values_full.astype(jnp.float32),
        }
        from ..parallel import gmax, gmean, gmin, gstd

        if h.normalize_rewards:
            rev_full = jnp.concatenate([rev0[None], rev_rest], axis=0)
            new_buffer[DataKeys.REVERSED_DISCOUNTED_RETURNS] = rev_full
            # GLOBAL std across shards — preserves the reference's
            # whole-batch reward scale (``_feedforward.py:428-436``).
            reward_scale = gstd(rev_full[1:], self._axis)
        else:
            reward_scale = jnp.asarray(1.0, dtype=jnp.float32)

        # --- metrics (``:410-424``), reduced globally across shards.
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
        )
        return new_state, stats

    def collect(
        self,
        *,
        env_config: None | dict[str, Any] = None,
        deterministic: bool = False,
    ) -> CollectStats:
        """Collect environment transitions and policy samples in the buffer
        (``/root/reference/src/rl8/algorithms/_feedforward.py:301-441``).

        The environment is reset per ``horizons_per_env_reset``; otherwise
        the last observation carries over. Sets the ``buffered`` flag so
        :meth:`step` isn't called with dummy data.

        Args:
            env_config: Optional config for the env's reset (ignored when
                no reset is scheduled).
            deterministic: Sample deterministically (evaluation) vs
                stochastically (learning).

        Returns:
            Summary statistics of the collected experiences.

        """
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
        state: AlgorithmState,
        lr: jax.Array,
        entropy_coeff: jax.Array | float,
        use_entropy: bool,
    ) -> tuple[AlgorithmState, dict[str, jax.Array]]:
        """One fully-jitted PPO update (``_feedforward.py:443-615``)."""
        h = self.hparams
        B, T = self._impl_B, h.horizon  # B is per-shard under shard_map
        N = B * T
        M = h.num_minibatches
        mb_rows = N // M  # per-shard minibatch rows
        E = h.num_sgd_iters
        accum = M if h.accumulate_grads else 1
        model = self.policy.model
        dist_cls = self.policy.distribution_cls
        buffer = state.buffer
        # With the entropy bonus statically absent, pass a literal zero so
        # `ppo_losses` skips the entropy term entirely (required for
        # distributions like SquashedNormal whose entropy is undefined).
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
            # GLOBAL whole-batch standardization across shards
            # (``nn/functional.py:118-122`` semantics).
            from ..parallel import gmean, gstd

            advantages = (advantages - gmean(advantages, self._axis)) / (
                gstd(advantages, self._axis) + 1e-8
            )

        # Batchify: [T, B, ...] -> [B * T, ...]; views from the whole
        # [B, T, ...] buffer — non-obs keys included, so models may
        # window past actions/rewards/logp/values exactly like the
        # reference (``_feedforward.py:469-482``; view application over
        # the full buffer at ``policies/_feedforward.py:135-138``).
        views = model.apply_view_requirements(
            self._training_view_batch(buffer), kind="all"
        )
        flat = {
            DataKeys.ACTIONS: _t2b(buffer[DataKeys.ACTIONS]),
            DataKeys.LOGP: _t2b(buffer[DataKeys.LOGP]),
            DataKeys.ADVANTAGES: _t2b(advantages),
            DataKeys.RETURNS: _t2b(returns),
            DataKeys.VIEWS: views,
        }
        final_obs = jax.tree_util.tree_map(lambda x: x[-1], buffer[DataKeys.OBS])

        # Pack the training batch into ONE 4-byte-element [N, D] matrix so
        # an epoch's shuffle is a single gather and minibatch selection is
        # a free contiguous slice (TPU gathers pay per-leaf per-row costs;
        # see rl8_tpu/ops/packing.py). Bit-exact round trip.
        from ..ops import pack_rows

        packed, unpack = pack_rows(flat)
        D = packed.shape[1]
        rng, perm_key = jax.random.split(state.rng)
        if self._axis is not None:
            # Per-shard minibatch shuffles (a stratified global shuffle:
            # each optimizer step still averages gradients over all
            # shards' minibatches via pmean).
            perm_key = jax.random.fold_in(
                perm_key, jax.lax.axis_index(self._axis)
            )
        epoch_keys = jax.random.split(perm_key, E)
        # Optimizer-apply flags per epoch position (static pattern).
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
            features, values = self._apply_model(params, mb[DataKeys.VIEWS])
            dist = dist_cls(features, model)
            losses = ppo_losses(
                mb,
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
                dist.logp(mb[DataKeys.ACTIONS]).reshape(-1)
                - mb[DataKeys.LOGP].reshape(-1)
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
                    from ..ops.fused_ppo import fused_ppo_grads

                    losses, kl, grads = fused_ppo_grads(
                        model, carry["params"], mb_packed, unpack,
                        entropy_coeff, ppo_cfg,
                    )
                else:
                    mb = unpack(mb_packed)
                    (_, (losses, kl)), grads = grad_fn(carry["params"], mb)
                if self._axis is not None:
                    # Average gradients and stats over the env shards: the
                    # global loss is the mean over the global minibatch,
                    # and every shard applies the identical update.
                    from ..parallel import pmean_tree

                    losses, kl, grads = pmean_tree(
                        (losses, kl, grads), self._axis
                    )
                trigger = (
                    kl > 1.5 * h.target_kl_div
                    if h.target_kl_div is not None
                    else jnp.asarray(False)
                )
                # Stats mirror the reference's StatTracker: losses are
                # tracked post-division by the accumulation steps, summed
                # within an accumulation window, then averaged over
                # windows (``_utils.py:259-313``).
                scaled = {k: losses[k] / accum for k in ("entropy", "policy", "vf", "total")}
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

        def _epoch(carry: dict[str, Any], epoch_key: jax.Array) -> tuple[dict[str, Any], None]:
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

        # Reset the buffer, restoring the final observation
        # (``_feedforward.py:603-610``).
        new_buffer = jax.tree_util.tree_map(jnp.zeros_like, buffer)
        new_buffer[DataKeys.OBS] = jax.tree_util.tree_map(
            lambda z, o: z.at[-1].set(o), new_buffer[DataKeys.OBS], final_obs
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
        (``/root/reference/src/rl8/algorithms/_feedforward.py:443-615``).

        Returns:
            Loss/coefficient/KL stats for the step.

        """
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
            # Scheduler cadence mirrors ``_feedforward.py:599-600``.
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

    # ------------------------------------------------------------------
    # fused multi-step training
    # ------------------------------------------------------------------

    def _train_impl(
        self,
        state: AlgorithmState,
        lrs: jax.Array,
        entropy_coeffs: jax.Array,
        env_config: None | dict[str, Any],
        num_steps: int,
        use_entropy: bool,
    ) -> tuple[AlgorithmState, dict[str, jax.Array]]:
        """``num_steps`` collect+step iterations as ONE compiled program.

        The reference (and the unfused path here) pays a host round trip
        per collect and per step; on TPU — especially over remote
        dispatch — that latency dominates at small model sizes. Fusing
        the whole train loop into a ``lax.scan`` amortizes dispatch to
        one launch and one stats fetch per ``num_steps`` iterations.

        Per-step learning rates / entropy coefficients are precomputed on
        the host (the schedules are pure functions of the transition
        count) and passed as scan inputs, so scheduling semantics match
        the unfused path exactly.
        """

        def _body(
            state: AlgorithmState, xs: tuple[jax.Array, jax.Array]
        ) -> tuple[AlgorithmState, dict[str, jax.Array]]:
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
        """Run ``num_steps`` fused collect+step iterations on device and
        return per-iteration train stats.

        Semantically equivalent to ``num_steps`` alternating
        :meth:`collect`/:meth:`step` calls (same RNG stream, same
        scheduler cadence), but compiled into a single XLA program —
        the fast path for production training throughput.
        """
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
                # Mirror the per-step scheduler cadence
                # (``_feedforward.py:599-600``).
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

    # ------------------------------------------------------------------
    # validation
    # ------------------------------------------------------------------

    def validate(self) -> None:
        """Validate env/policy/buffer shape contracts with one real
        reset→sample→step round trip
        (``/root/reference/src/rl8/algorithms/_feedforward.py:617-698``).

        The round trip runs as a SINGLE jitted program: eager execution
        here would dispatch every tiny op in the model/env as its own
        XLA compile, which is minutes of wall clock on remote-compile
        TPU toolchains (measured 296 s for the AttentiveAlpaca example
        vs ~4 s for its whole jitted collect program).
        """
        B = self.hparams.num_envs

        def _probe(params: Any, key: jax.Array):
            env_state, obs = self.env.reset(key)
            # The reference samples with the whole (zeroed) buffer
            # sliced to one timestep (``_feedforward.py:638-649``), so
            # non-obs keys a model's views reference are present as
            # zero entries.
            batch: dict[str, Any] = {
                DataKeys.OBS: jax.tree_util.tree_map(
                    lambda o: o[:, None], obs
                )
            }
            for root in self._nonobs_view_roots:
                batch[root] = (
                    self.env.action_spec.zero((B, 1))
                    if root == DataKeys.ACTIONS
                    else jnp.zeros((B, 1, 1))
                )
            sample = self.policy.sample(
                params,
                batch,
                kind="last",
                key=key,
                deterministic=False,
                return_actions=True,
                return_logp=True,
                return_values=True,
            )
            env_state, next_obs, rewards = self.env.step(
                env_state, sample[DataKeys.ACTIONS]
            )
            return obs, sample, next_obs, rewards

        obs, sample, next_obs, rewards = jax.jit(_probe)(
            self.state.params, jax.random.key(0)
        )
        self.env.observation_spec.assert_is_in(obs)
        actions = sample[DataKeys.ACTIONS]
        assert jnp.ndim(actions) >= 2, (
            "Actions must be at least 2D and have shape ``[N, ...]`` (where"
            " ``N`` is the number of environment instances)."
        )
        self.env.action_spec.assert_is_in(actions)
        assert sample[DataKeys.LOGP].shape == (B, 1), (
            "Action log probabilities must be 2D with shape ``[N, 1]``."
        )
        assert sample[DataKeys.VALUES].shape == (B, 1), (
            "Value estimates must be 2D with shape ``[N, 1]``."
        )
        self.env.observation_spec.assert_is_in(next_obs)
        assert rewards.shape == (B, 1), (
            "Rewards must be 2D with shape ``[N, 1]``."
        )

        # Training-path (`kind="all"`) contract: applying the model's
        # view requirements over a buffer-shaped batch must fold [B, T]
        # into a single [B * T] batch that aligns with the flattened
        # buffer the PPO update consumes (the alignment the reference's
        # buffer scatter-asserts enforce, ``_feedforward.py:617-698``).
        # The check runs on a small env slice — the folding contract is
        # batch-size-independent, and the full [B * T] forward would be
        # a transient allocation up to ``num_minibatches`` times larger
        # than anything training materializes. Only SHAPES are asserted,
        # so the whole phase runs under ``jax.eval_shape`` — a pure
        # trace, no compile and no device work.
        T = self.hparams.horizon
        Bv = min(B, 2)

        def _all_probe(params: Any, key: jax.Array):
            # Build the zero buffer at Bv envs directly — a full-size
            # [T+1, num_envs, ...] transient (plus its transposed copy)
            # could OOM validate() for image-sized observations even
            # though training itself fits.
            view_batch = self._training_view_batch(self._zero_buffer(Bv))
            views = self.policy.model.apply_view_requirements(
                view_batch, kind="all"
            )
            sample_all = self.policy.sample(
                params,
                {DataKeys.VIEWS: views},
                kind="all",
                key=key,
                deterministic=False,
                return_actions=True,
                return_logp=True,
                return_values=True,
            )
            return views, sample_all

        views, sample_all = jax.eval_shape(
            _all_probe, self.state.params, jax.random.key(0)
        )
        leading = {
            leaf.shape[0] for leaf in jax.tree_util.tree_leaves(views)
        }
        assert leading == {Bv * T}, (
            "`apply_view_requirements(kind='all')` must produce a batch of"
            f" size ``[B * T, ...]`` = [{Bv * T}, ...] aligned with the"
            f" flattened rollout buffer; got leading sizes {leading}."
        )
        assert sample_all[DataKeys.LOGP].shape == (Bv * T, 1), (
            "Training-path action log probabilities must have shape"
            " ``[B * T, 1]``."
        )
        assert sample_all[DataKeys.VALUES].shape == (Bv * T, 1), (
            "Training-path value estimates must have shape ``[B * T, 1]``."
        )
