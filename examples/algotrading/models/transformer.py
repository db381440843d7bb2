"""AttentiveAlpaca: self-attention over historical price changes.

Flax counterpart of
``/root/reference/examples/algotrading/models/transformer.py``:
self-attention over a padded price-change window, masked-average
pooling, and -inf action-mask logits.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from rl8_tpu.data import DataKeys

from ._common import action_mask_logits
from rl8_tpu.models import GenericModel, small_uniform_init
from rl8_tpu.nn import MLP, OneHotEmbed, SelfAttentionStack, get_activation, masked_avg
from rl8_tpu.nn.modules.embeddings import one_hot_embed
from rl8_tpu.views import ViewRequirement

__all__ = ["AttentiveAlpaca"]


class AttentiveAlpaca(GenericModel):
    """A model that applies self-attention to historical price changes to
    construct logits for action sampling.

    Args:
        invested_embed_dim: Embedding size for the invested flag.
        price_embed_dim: Embedding size for price changes.
        seq_len: Historical price changes per attention window.
        num_heads: Attention heads per layer.
        num_layers: Self-attention stack depth (parameters shared).
        hiddens: Hidden layer sizes for the feature/value models; the
            first entry also sizes the attention feedforward.
        activation_fn: Activation function ID.

    """

    invested_embed_dim: int = 2
    price_embed_dim: int = 8
    seq_len: int = 4
    num_heads: int = 4
    num_layers: int = 2
    hiddens: Sequence[int] = (64, 64)
    activation_fn: str = "relu"
    dtype: Any = None

    @property
    def view_requirements(self) -> dict:
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
        padding_mask = obs["LOG_CHANGE(price)"][DataKeys.PADDING_MASK]
        x_price = nn.Dense(
            self.price_embed_dim, dtype=self.dtype, name="price_embedding"
        )(obs["LOG_CHANGE(price)"][DataKeys.INPUTS])
        x_price = SelfAttentionStack(
            embed_dim=self.price_embed_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            hidden_dim=self.hiddens[0],
            activation_fn=self.activation_fn,
            skip_kind="residual",
            share_parameters=True,
            dtype=self.dtype,
            name="price_attention",
        )(x_price, padding_mask)
        x_price = masked_avg(x_price, mask=~padding_mask, dim=1, keepdim=False)
        x = jnp.concatenate(
            [x_invested, obs["LOG_CHANGE(price, position)"], x_price], axis=-1
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
        inf_mask = action_mask_logits(obs)
        vf_latents = act(
            MLP(self.hiddens, activation_fn=self.activation_fn, layer_norm=True,
                dtype=self.dtype, name="vf_model")(x)
        )
        values = nn.Dense(1, dtype=self.dtype, name="vf_head")(vf_latents)
        return {"logits": logits + inf_mask}, values.astype(jnp.float32)

    def fused_apply_spec(self) -> Any:
        """Fused-kernel decomposition (``rl8_tpu/ops/fused_mlp.py``): the
        embedding + self-attention + masked-average pooling run in XLA
        (re-applying the same flax submodules, so that part is
        numerically identical to the plain forward), while the twin
        LayerNorm-MLP/head chains run in one Pallas kernel. Gradients
        flow back into the attention stack through the kernel's ``dx``."""
        from rl8_tpu.ops.fused_mlp import FusedApplySpec

        def assemble(params: Any, batch: Any) -> jax.Array:
            obs = batch[DataKeys.OBS]
            x_invested = one_hot_embed(
                params["invested_embedding"]["embedding"],
                obs["invested"].reshape(-1),
            )
            padding_mask = obs["LOG_CHANGE(price)"][DataKeys.PADDING_MASK]
            x_price = nn.Dense(self.price_embed_dim, dtype=self.dtype).apply(
                {"params": params["price_embedding"]},
                obs["LOG_CHANGE(price)"][DataKeys.INPUTS],
            )
            x_price = SelfAttentionStack(
                embed_dim=self.price_embed_dim,
                num_layers=self.num_layers,
                num_heads=self.num_heads,
                hidden_dim=self.hiddens[0],
                activation_fn=self.activation_fn,
                skip_kind="residual",
                share_parameters=True,
                dtype=self.dtype,
            ).apply({"params": params["price_attention"]}, x_price, padding_mask)
            x_price = masked_avg(x_price, mask=~padding_mask, dim=1, keepdim=False)
            x = jnp.concatenate(
                [x_invested, obs["LOG_CHANGE(price, position)"], x_price],
                axis=-1,
            )
            if self.dtype is not None:
                x = x.astype(self.dtype)
            return x

        def finalize(batch: Any, outs: Any) -> tuple[dict, jax.Array]:
            (logits,), (values,) = outs
            obs = batch[DataKeys.OBS]
            inf_mask = action_mask_logits(obs)
            return {"logits": logits.reshape(-1, 1, 3) + inf_mask}, values

        return FusedApplySpec(
            assemble=assemble,
            finalize=finalize,
            chain_names=(
                ("feature_model", ("feature_head",)),
                ("vf_model", ("vf_head",)),
            ),
        )
