"""Recurrent models.

Counterpart of ``/root/reference/src/rl8/models/_recurrent.py``. Instead
of cuDNN ``nn.LSTM`` with ``[L, B, H]`` permutes at the boundary
(``models/_recurrent.py:210-248``), recurrence is a stack of flax
``OptimizedLSTMCell``s scanned over time by ``nn.RNN`` — XLA fuses the
per-step matmuls onto the MXU. States stay in the natural ``[B, L, H]``
layout end to end.

Pure forward contract: ``__call__(batch [B, T, ...], states) ->
((features [B*T, ...], values [B*T, 1]), new_states [B, ...])``.
"""

from __future__ import annotations

from typing import Any, Protocol

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data import DataKeys
from ..specs import Composite, Discrete, Spec, Unbounded, assert_1d_spec
from ._base import GenericModelBase
from ._feedforward import small_uniform_init

__all__ = [
    "RecurrentModel",
    "RecurrentModelFactory",
    "GenericRecurrentModel",
    "DefaultContinuousRecurrentModel",
    "DefaultDiscreteRecurrentModel",
]


class RecurrentModel(GenericModelBase):
    """Recurrent policy component processing observations and recurrent
    states into features, a value estimate, and updated states
    (``/root/reference/src/rl8/models/_recurrent.py:19-138``).
    """

    @property
    def state_spec(self) -> Composite:
        """Spec defining recurrent model states (part of forward IO).
        Must be overridden by subclasses."""
        raise NotImplementedError

    @staticmethod
    def default_model_cls(
        observation_spec: Spec, action_spec: Spec, /
    ) -> type["RecurrentModel"]:
        """Return a default recurrent model class based on the given specs
        (``models/_recurrent.py:42-73``)."""
        if not isinstance(observation_spec, Unbounded):
            raise TypeError(
                f"Observation spec {observation_spec} has no default model support."
            )
        assert_1d_spec(observation_spec)
        assert_1d_spec(action_spec)
        if isinstance(action_spec, Discrete):
            return DefaultDiscreteRecurrentModel
        if isinstance(action_spec, Unbounded):
            return DefaultContinuousRecurrentModel
        raise TypeError(f"Action spec {action_spec} has no default model support.")

    def init_states(self, n: int, /) -> dict[str, jax.Array]:
        """Return zeroed initial recurrent states for ``n`` batch elements
        (``models/_recurrent.py:104-120``)."""
        return self.state_spec.zero((n,))

    def fused_apply_spec(self) -> Any:
        """Optional fused-kernel decomposition for custom recurrent
        models (see
        :class:`rl8_tpu.ops.fused_mlp.FusedRecurrentApplySpec`).

        Return a ``FusedRecurrentApplySpec`` to run this model's
        post-RNN torso/head chains through the fused Pallas kernels on
        TPU (the RNN front half and output postprocessing stay in XLA,
        differentiably). The default ``None`` keeps the plain flax
        apply path.
        """
        return None

    def __call__(
        self, batch: Any, states: Any
    ) -> tuple[tuple[dict[str, jax.Array], jax.Array], Any]:
        raise NotImplementedError


class RecurrentModelFactory(Protocol):
    """Factory protocol describing how to create a recurrent model
    (``models/_recurrent.py:141-147``)."""

    def __call__(
        self, observation_spec: Spec, action_spec: Spec, /, **config: Any
    ) -> RecurrentModel:
        ...


class GenericRecurrentModel(RecurrentModel):
    """Generic recurrent model with fixed specs
    (``models/_recurrent.py:150-166``)."""


class _StackedLSTM(nn.Module):
    """Multi-layer LSTM over a ``[B, T, D]`` sequence with explicit
    ``[B, L, H]`` hidden/cell states."""

    hidden_size: int
    num_layers: int
    #: Compute dtype (params stay f32); ``jnp.bfloat16`` for TPU AMP.
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jax.Array, h0: jax.Array, c0: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        hs, cs = [], []
        out = x
        for layer in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(
                self.hidden_size, dtype=self.dtype, name=f"lstm_{layer}"
            )
            (c_n, h_n), out = nn.RNN(cell, name=f"rnn_{layer}")(
                out,
                initial_carry=(c0[:, layer], h0[:, layer]),
                return_carry=True,
            )
            hs.append(h_n)
            cs.append(c_n)
        return out, jnp.stack(hs, axis=1), jnp.stack(cs, axis=1)


def _lstm_state_spec(num_layers: int, hidden_size: int) -> Composite:
    return Composite(
        {
            DataKeys.HIDDEN_STATES: Unbounded((num_layers, hidden_size)),
            DataKeys.CELL_STATES: Unbounded((num_layers, hidden_size)),
        }
    )


class DefaultContinuousRecurrentModel(GenericRecurrentModel):
    """Default recurrent model for 1D continuous observations and action
    spaces: LSTM torso with small-init mean/log_std heads
    (``models/_recurrent.py:169-256``)."""

    hidden_size: int = 256
    num_layers: int = 1
    bias: bool = True
    dtype: Any = None

    @property
    def state_spec(self) -> Composite:
        return _lstm_state_spec(self.num_layers, self.hidden_size)

    @nn.compact
    def __call__(
        self, batch: Any, states: Any
    ) -> tuple[tuple[dict[str, jax.Array], jax.Array], Any]:
        if not self.bias:
            raise NotImplementedError(
                "`bias=False` is not supported for the default recurrent"
                " models: flax's LSTM cells have no bias toggle, so the"
                " flag would be silently ignored rather than matching"
                " the reference's `nn.LSTM(bias=False)` architecture."
            )
        obs = batch[DataKeys.OBS]
        if self.dtype is not None:
            obs = obs.astype(self.dtype)
        action_dim = self.action_spec.shape[0]
        h0 = states[DataKeys.HIDDEN_STATES]
        c0 = states[DataKeys.CELL_STATES]
        latents, h_n, c_n = _StackedLSTM(
            self.hidden_size, self.num_layers, dtype=self.dtype, name="lstm"
        )(obs, h0, c0)
        mean = nn.Dense(
            action_dim,
            kernel_init=small_uniform_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="action_mean",
        )(latents).reshape(-1, action_dim)
        log_std = nn.Dense(
            action_dim,
            kernel_init=small_uniform_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="action_log_std",
        )(latents).reshape(-1, action_dim)
        values = nn.Dense(
            1, use_bias=self.bias, dtype=self.dtype, name="vf_model"
        )(latents).reshape(-1, 1)
        features = {
            "mean": mean.astype(jnp.float32),
            "log_std": jnp.tanh(log_std).astype(jnp.float32),
        }
        new_states = {
            DataKeys.HIDDEN_STATES: h_n.astype(jnp.float32),
            DataKeys.CELL_STATES: c_n.astype(jnp.float32),
        }
        return (features, values.astype(jnp.float32)), new_states


class DefaultDiscreteRecurrentModel(GenericRecurrentModel):
    """Default recurrent model for 1D continuous observations and discrete
    action spaces (``models/_recurrent.py:259-341``)."""

    hidden_size: int = 256
    num_layers: int = 1
    bias: bool = True
    dtype: Any = None

    @property
    def state_spec(self) -> Composite:
        return _lstm_state_spec(self.num_layers, self.hidden_size)

    @nn.compact
    def __call__(
        self, batch: Any, states: Any
    ) -> tuple[tuple[dict[str, jax.Array], jax.Array], Any]:
        if not self.bias:
            raise NotImplementedError(
                "`bias=False` is not supported for the default recurrent"
                " models: flax's LSTM cells have no bias toggle, so the"
                " flag would be silently ignored rather than matching"
                " the reference's `nn.LSTM(bias=False)` architecture."
            )
        obs = batch[DataKeys.OBS]
        if self.dtype is not None:
            obs = obs.astype(self.dtype)
        assert isinstance(self.action_spec, Discrete)
        action_dim = self.action_spec.shape[0]
        n = self.action_spec.n
        h0 = states[DataKeys.HIDDEN_STATES]
        c0 = states[DataKeys.CELL_STATES]
        latents, h_n, c_n = _StackedLSTM(
            self.hidden_size, self.num_layers, dtype=self.dtype, name="lstm"
        )(obs, h0, c0)
        logits = nn.Dense(
            action_dim * n,
            kernel_init=small_uniform_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="feature_head",
        )(latents).reshape(-1, action_dim, n)
        values = nn.Dense(
            1, use_bias=self.bias, dtype=self.dtype, name="vf_head"
        )(latents).reshape(-1, 1)
        new_states = {
            DataKeys.HIDDEN_STATES: h_n.astype(jnp.float32),
            DataKeys.CELL_STATES: c_n.astype(jnp.float32),
        }
        return ({"logits": logits.astype(jnp.float32)}, values.astype(jnp.float32)), new_states
