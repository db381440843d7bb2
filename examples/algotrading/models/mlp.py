"""MischievousMule: MLP over aggregated historical price changes.

Flax counterpart of
``/root/reference/examples/algotrading/models/mlp.py``: a custom view
requirement (``shift=seq_len`` on a nested observation key,
``mlp.py:64-66``) provides windows of historical price changes that are
sum-aggregated at several intervals into the feature vector, with -inf
action-mask logits.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from rl8_tpu.data import DataKeys

from ._common import action_mask_logits
from rl8_tpu.models import GenericModel, small_uniform_init
from rl8_tpu.nn import MLP, OneHotEmbed, get_activation
from rl8_tpu.nn.modules.embeddings import one_hot_embed
from rl8_tpu.views import ViewRequirement

__all__ = ["MischievousMule"]


def _price_features(obs: dict, L: int) -> jax.Array:
    """Sum-aggregate the windowed price changes at four intervals —
    shared by the flax forward and the fused-kernel assembly so both
    paths compute the identical feature vector."""
    x_price = obs["LOG_CHANGE(price)"][DataKeys.INPUTS]
    return jnp.concatenate(
        [
            jnp.sum(x_price[:, : L // 4], axis=1),
            jnp.sum(x_price[:, : L // 2], axis=1),
            jnp.sum(x_price[:, -(L // 2) :], axis=1),
            jnp.sum(x_price[:, -(L // 4) :], axis=1),
        ],
        axis=-1,
    )




class MischievousMule(GenericModel):
    """A model that aggregates historical price changes at different
    intervals to form a latent vector fed into the feature/value heads.

    Args:
        invested_embed_dim: Embedding size for the invested flag.
        seq_len: Number of historical price changes to aggregate; must be
            divisible by 4 and less than the training horizon.
        hiddens: Hidden layer sizes for the feature and value models.
        activation_fn: Activation function ID.

    """

    invested_embed_dim: int = 2
    seq_len: int = 4
    hiddens: Sequence[int] = (128, 128)
    activation_fn: str = "relu"
    dtype: Any = None

    @property
    def view_requirements(self) -> dict:
        assert not self.seq_len % 4, "`seq_len` must be divisible by 4."
        return {
            DataKeys.OBS: ViewRequirement(shift=0),
            (DataKeys.OBS, "LOG_CHANGE(price)"): ViewRequirement(shift=self.seq_len),
        }

    @nn.compact
    def __call__(self, batch: Any) -> tuple[dict[str, jax.Array], jax.Array]:
        obs = batch[DataKeys.OBS]
        x_invested = OneHotEmbed(2, self.invested_embed_dim, name="invested_embedding")(
            obs["invested"].reshape(-1)
        )
        x = jnp.concatenate(
            [
                x_invested,
                obs["LOG_CHANGE(price, position)"],
                _price_features(obs, self.seq_len),
            ],
            axis=-1,
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
        act = get_activation(self.activation_fn)
        latents = act(
            MLP(self.hiddens, activation_fn=self.activation_fn, layer_norm=True,
                dtype=self.dtype, name="feature_model")(x)
        )
        logits = nn.Dense(
            3,
            kernel_init=small_uniform_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="feature_head",
        )(latents).reshape(-1, 1, 3).astype(jnp.float32)
        vf_latents = act(
            MLP(self.hiddens, activation_fn=self.activation_fn, layer_norm=True,
                dtype=self.dtype, name="vf_model")(x)
        )
        values = nn.Dense(1, dtype=self.dtype, name="vf_head")(vf_latents)
        return {"logits": logits + action_mask_logits(obs)}, values.astype(
            jnp.float32
        )

    def fused_apply_spec(self) -> Any:
        """Fused-kernel decomposition (``rl8_tpu/ops/fused_mlp.py``): the
        cheap composite-obs assembly (embedding lookup + interval sums)
        and the -inf action masking stay in XLA; the twin
        LayerNorm-MLP/head chains run in one Pallas kernel. This is the
        fast path behind the algotrading tracked config's throughput."""
        from rl8_tpu.ops.fused_mlp import FusedApplySpec

        L = self.seq_len

        def assemble(params: Any, batch: Any) -> jax.Array:
            obs = batch[DataKeys.OBS]
            emb = params["invested_embedding"]["embedding"]
            x_invested = one_hot_embed(emb, obs["invested"].reshape(-1))
            x = jnp.concatenate(
                [
                    x_invested,
                    obs["LOG_CHANGE(price, position)"],
                    _price_features(obs, L),
                ],
                axis=-1,
            )
            if self.dtype is not None:
                x = x.astype(self.dtype)
            return x

        def finalize(batch: Any, outs: Any) -> tuple[dict, jax.Array]:
            (logits,), (values,) = outs
            obs = batch[DataKeys.OBS]
            return {
                "logits": logits.reshape(-1, 1, 3) + action_mask_logits(obs)
            }, values

        return FusedApplySpec(
            assemble=assemble,
            finalize=finalize,
            chain_names=(
                ("feature_model", ("feature_head",)),
                ("vf_model", ("vf_head",)),
            ),
        )
