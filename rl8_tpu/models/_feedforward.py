"""Feedforward models.

Counterpart of ``/root/reference/src/rl8/models/_feedforward.py``,
redesigned for purity: ``__call__(batch) -> (features, values)`` instead
of the reference's cached ``value_function()``
(``models/_feedforward.py:292-310``). View-requirement handling
(``:58-100``), spec-based default dispatch (``:102-133``), and drop-size
validation (``:135-203``) carry over.
"""

from __future__ import annotations

from typing import Any, Protocol, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data import DataKeys
from ..nn.modules import MLP, get_activation
from ..specs import Discrete, Spec, Unbounded, assert_1d_spec
from ..views import ViewKind, ViewRequirement
from ..utils import set_nested as _set_nested
from ._base import GenericModelBase

__all__ = [
    "Model",
    "ModelFactory",
    "GenericModel",
    "DefaultContinuousModel",
    "DefaultDiscreteModel",
    "small_uniform_init",
]


def small_uniform_init(scale: float = 1e-3) -> Any:
    """Symmetric small-uniform kernel init used for output heads
    (``models/_feedforward.py:274-278``)."""

    def init(key: jax.Array, shape: Any, dtype: Any = jnp.float32) -> jax.Array:
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

    return init




class Model(GenericModelBase):
    """Feedforward policy component that processes environment observations
    into action-distribution features and a value function estimate.

    Subclasses implement ``__call__(batch) -> (features, values)`` where
    ``batch`` is the view-requirement-processed input (a pytree with 1D
    batch shape ``[B, ...]``), ``features`` is a dict of arrays consumed
    by the action distribution, and ``values`` is ``[B, 1]``.
    """

    @property
    def view_requirements(self) -> dict[str | tuple[str, ...], ViewRequirement]:
        """Requirements on how a batch is preprocessed before the forward
        pass. Defaults to passing observations with no shifting
        (``models/_feedforward.py:48-56``). Override for custom views.
        """
        return {DataKeys.OBS: ViewRequirement(shift=0)}

    def apply_view_requirements(self, batch: Any, /, *, kind: ViewKind = "last") -> Any:
        """Apply the model's view requirements, reshaping the batch
        ``[B, T, ...]`` as needed (``models/_feedforward.py:58-100``).

        Args:
            batch: Pytree with leading ``[B, T, ...]`` dims per leaf.
            kind: ``"last"`` (inference on latest observations) or
                ``"all"`` (training over the whole horizon, folding time
                into batch).

        """
        out: dict[str, Any] = {}
        for key, view_requirement in self.view_requirements.items():
            match kind:
                case "all":
                    item = view_requirement.apply_all(key, batch)
                case "last":
                    item = view_requirement.apply_last(key, batch)
                case _:
                    raise ValueError(
                        f"Unknown view kind {kind!r}; expected 'last' or"
                        " 'all'."
                    )
            _set_nested(out, key, item)
        return out

    @staticmethod
    def default_model_cls(observation_spec: Spec, action_spec: Spec, /) -> type["Model"]:
        """Return a default model class based on the given specs
        (``models/_feedforward.py:102-133``).

        Examples:
            >>> from rl8_tpu.models import Model
            >>> from rl8_tpu.specs import Discrete, Unbounded
            >>> Model.default_model_cls(Unbounded(4), Discrete(3, shape=(1,))).__name__
            'DefaultDiscreteModel'
            >>> Model.default_model_cls(Unbounded(4), Unbounded(2)).__name__
            'DefaultContinuousModel'

        """
        if not isinstance(observation_spec, Unbounded):
            raise TypeError(
                f"Observation spec {observation_spec} has no default model support."
            )
        assert_1d_spec(observation_spec)
        assert_1d_spec(action_spec)
        if isinstance(action_spec, Discrete):
            return DefaultDiscreteModel
        if isinstance(action_spec, Unbounded):
            return DefaultContinuousModel
        raise TypeError(f"Action spec {action_spec} has no default model support.")

    def _drop_sizes(self) -> dict[str, int]:
        """Per-key drop sizes; loud on empty ``view_requirements`` (the
        shared check behind :attr:`drop_size` and
        :meth:`validate_view_requirements`)."""
        drop_sizes = {
            key: vr.drop_size for key, vr in self.view_requirements.items()
        }
        if not drop_sizes:
            raise RuntimeError(
                f"{self} has empty `view_requirements`. A model must"
                " declare at least one view requirement (the default is"
                ' `{DataKeys.OBS: ViewRequirement(shift=0)}`) so the'
                " algorithm knows how to preprocess rollout batches."
            )
        return drop_sizes

    @property
    def drop_size(self) -> int:
        """The model's drop size (``models/_feedforward.py:135-144``)."""
        return next(iter(self._drop_sizes().values()))

    def validate_view_requirements(self) -> None:
        """Raise if view requirements imply an ambiguous batch size
        (``models/_feedforward.py:181-203``)."""
        drop_sizes = self._drop_sizes()
        if len(set(drop_sizes.values())) > 1:
            raise RuntimeError(
                f"{self} view requirements with drop sizes {drop_sizes} result"
                " in an ambiguous batch size. Use view requirement methods"
                " without sample dropping, or handle sequencing inside your"
                " environment's observation function."
            )

    def fused_apply_spec(self) -> Any:
        """Optional fused-kernel decomposition for custom MLP-style
        models (see :class:`rl8_tpu.ops.fused_mlp.FusedApplySpec`).

        Return a ``FusedApplySpec`` to run this model's torso/head
        chains through the fused Pallas kernels on TPU (input assembly
        and output postprocessing stay in XLA, differentiably). The
        default ``None`` keeps the plain flax apply path.
        """
        return None

    def __call__(self, batch: Any) -> tuple[dict[str, jax.Array], jax.Array]:
        raise NotImplementedError


class ModelFactory(Protocol):
    """Factory protocol describing how to create a model instance
    (``models/_feedforward.py:206-212``)."""

    def __call__(self, observation_spec: Spec, action_spec: Spec, /, **config: Any) -> Model:
        ...


class GenericModel(Model):
    """Generic model for constructing models from fixed observation and
    action specs (``models/_feedforward.py:215-231``)."""


class DefaultContinuousModel(GenericModel):
    """Default model for 1D continuous observations and action spaces:
    twin MLP torsos with small-init mean/log_std heads, the log_std head
    tanh-bounded (``models/_feedforward.py:234-310``)."""

    hiddens: Sequence[int] = (256, 256)
    activation_fn: str = "relu"
    bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, batch: Any) -> tuple[dict[str, jax.Array], jax.Array]:
        obs = batch[DataKeys.OBS]
        if self.dtype is not None:
            obs = obs.astype(self.dtype)
        act = get_activation(self.activation_fn)
        action_dim = self.action_spec.shape[0]
        latents = act(
            MLP(self.hiddens, activation_fn=self.activation_fn, bias=self.bias,
                dtype=self.dtype, name="latent_model")(obs)
        )
        mean = nn.Dense(
            action_dim,
            kernel_init=small_uniform_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="action_mean",
        )(latents)
        log_std = nn.Dense(
            action_dim,
            kernel_init=small_uniform_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="action_log_std",
        )(latents)
        vf_latents = act(
            MLP(self.hiddens, activation_fn=self.activation_fn, bias=self.bias,
                dtype=self.dtype, name="vf_model")(obs)
        )
        values = nn.Dense(1, dtype=self.dtype, name="vf_head")(vf_latents)
        features = {
            "mean": mean.astype(jnp.float32),
            "log_std": jnp.tanh(log_std).astype(jnp.float32),
        }
        return features, values.astype(jnp.float32)


class DefaultDiscreteModel(GenericModel):
    """Default model for 1D continuous observations and discrete action
    spaces: MLP torso with a small-init logits head reshaped to
    ``[B, A, n]`` (``models/_feedforward.py:313-383``)."""

    hiddens: Sequence[int] = (256, 256)
    activation_fn: str = "relu"
    bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, batch: Any) -> tuple[dict[str, jax.Array], jax.Array]:
        obs = batch[DataKeys.OBS]
        if self.dtype is not None:
            obs = obs.astype(self.dtype)
        act = get_activation(self.activation_fn)
        assert isinstance(self.action_spec, Discrete)
        action_dim = self.action_spec.shape[0]
        n = self.action_spec.n
        latents = act(
            MLP(self.hiddens, activation_fn=self.activation_fn, bias=self.bias,
                dtype=self.dtype, name="feature_model")(obs)
        )
        logits = nn.Dense(
            action_dim * n,
            kernel_init=small_uniform_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="feature_head",
        )(latents).reshape(-1, action_dim, n)
        vf_latents = act(
            MLP(self.hiddens, activation_fn=self.activation_fn, bias=self.bias,
                dtype=self.dtype, name="vf_model")(obs)
        )
        values = nn.Dense(1, dtype=self.dtype, name="vf_head")(vf_latents)
        return {"logits": logits.astype(jnp.float32)}, values.astype(jnp.float32)
