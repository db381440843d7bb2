"""LazyLemur: an LSTM model that maintains states across horizons.

Flax counterpart of
``/root/reference/examples/algotrading/models/lstm.py``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from rl8_tpu.data import DataKeys

from ._common import action_mask_logits
from rl8_tpu.models import GenericRecurrentModel, small_uniform_init
from rl8_tpu.models._recurrent import _StackedLSTM, _lstm_state_spec
from rl8_tpu.nn import MLP, OneHotEmbed, get_activation
from rl8_tpu.nn.modules.embeddings import one_hot_embed
from rl8_tpu.specs import Composite

__all__ = ["LazyLemur"]


class LazyLemur(GenericRecurrentModel):
    """LSTM over (invested embedding, log price changes) with action
    masking (``lstm.py:13-134``).

    Args:
        invested_embed_dim: Embedding size for the invested flag.
        hidden_size: LSTM hidden width.
        num_layers: Number of stacked LSTM cells.
        hiddens: Hidden layer sizes for the feature/value models.
        activation_fn: Activation function ID.

    """

    invested_embed_dim: int = 2
    hidden_size: int = 64
    num_layers: int = 1
    hiddens: Sequence[int] = (64, 64)
    activation_fn: str = "relu"
    dtype: Any = None

    @property
    def state_spec(self) -> Composite:
        return _lstm_state_spec(self.num_layers, self.hidden_size)

    @nn.compact
    def __call__(
        self, batch: Any, states: Any
    ) -> tuple[tuple[dict[str, jax.Array], jax.Array], Any]:
        obs = batch[DataKeys.OBS]
        B, T = obs["invested"].shape[:2]
        x_invested = OneHotEmbed(2, self.invested_embed_dim, name="invested_embedding")(
            obs["invested"].reshape(-1)
        ).reshape(B, T, -1)
        x = jnp.concatenate(
            [
                x_invested,
                obs["LOG_CHANGE(price, position)"],
                obs["LOG_CHANGE(price)"],
            ],
            axis=-1,
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
        latents, h_n, c_n = _StackedLSTM(
            self.hidden_size, self.num_layers, dtype=self.dtype, name="lstm"
        )(x, states[DataKeys.HIDDEN_STATES], states[DataKeys.CELL_STATES])
        latents = latents.reshape(B * T, -1)
        act = get_activation(self.activation_fn)
        feats = act(
            MLP(self.hiddens, activation_fn=self.activation_fn, layer_norm=True,
                dtype=self.dtype, name="feature_model")(latents)
        )
        logits = nn.Dense(
            3,
            kernel_init=small_uniform_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="feature_head",
        )(feats).reshape(-1, 1, 3).astype(jnp.float32)
        inf_mask = action_mask_logits(obs)
        vf_latents = act(
            MLP(self.hiddens, activation_fn=self.activation_fn, layer_norm=True,
                dtype=self.dtype, name="vf_model")(latents)
        )
        values = nn.Dense(1, dtype=self.dtype, name="vf_head")(vf_latents)
        new_states = {
            DataKeys.HIDDEN_STATES: h_n.astype(jnp.float32),
            DataKeys.CELL_STATES: c_n.astype(jnp.float32),
        }
        return ({"logits": logits + inf_mask}, values.astype(jnp.float32)), new_states

    def fused_apply_spec(self) -> Any:
        """Fused-kernel decomposition (``rl8_tpu/ops/fused_mlp.py``): the
        embedding + stacked-LSTM scan stay in XLA (state threading is
        serial over time; the same flax submodule is re-applied so that
        part is numerically identical), while the twin post-LSTM
        LayerNorm-MLP/head chains run in one Pallas kernel. BPTT
        gradients flow into the LSTM through the kernel's ``dx``."""
        from rl8_tpu.ops.fused_mlp import FusedRecurrentApplySpec

        def assemble(params: Any, batch: Any, states: Any) -> tuple[jax.Array, Any]:
            obs = batch[DataKeys.OBS]
            B, T = obs["invested"].shape[:2]
            emb = params["invested_embedding"]["embedding"]
            x_invested = one_hot_embed(
                emb, obs["invested"].reshape(-1)
            ).reshape(B, T, -1)
            x = jnp.concatenate(
                [
                    x_invested,
                    obs["LOG_CHANGE(price, position)"],
                    obs["LOG_CHANGE(price)"],
                ],
                axis=-1,
            )
            if self.dtype is not None:
                x = x.astype(self.dtype)
            latents, h_n, c_n = _StackedLSTM(
                self.hidden_size, self.num_layers, dtype=self.dtype
            ).apply(
                {"params": params["lstm"]},
                x,
                states[DataKeys.HIDDEN_STATES],
                states[DataKeys.CELL_STATES],
            )
            new_states = {
                DataKeys.HIDDEN_STATES: h_n.astype(jnp.float32),
                DataKeys.CELL_STATES: c_n.astype(jnp.float32),
            }
            return latents.reshape(B * T, -1), new_states

        def finalize(batch: Any, outs: Any) -> tuple[dict, jax.Array]:
            (logits,), (values,) = outs
            obs = batch[DataKeys.OBS]
            inf_mask = action_mask_logits(obs)
            return {"logits": logits.reshape(-1, 1, 3) + inf_mask}, values

        return FusedRecurrentApplySpec(
            assemble=assemble,
            finalize=finalize,
            chain_names=(
                ("feature_model", ("feature_head",)),
                ("vf_model", ("vf_head",)),
            ),
        )
