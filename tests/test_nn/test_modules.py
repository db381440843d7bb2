import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rl8_tpu.nn import (
    ACTIVATIONS,
    MLP,
    CrossAttention,
    PerceiverIOLayer,
    PerceiverLayer,
    PointerNetwork,
    PositionalEmbedding,
    SelfAttention,
    SelfAttentionStack,
    SequentialSkipConnection,
    get_activation,
)


def test_activation_registry() -> None:
    assert len(ACTIVATIONS) == 18
    x = jnp.array([-1.0, 0.0, 1.0])
    for name in ACTIVATIONS:
        y = get_activation(name)(x)
        assert y.shape == x.shape
    assert float(get_activation("squared_relu")(jnp.array([2.0]))[0]) == 4.0
    assert float(get_activation("identity")(jnp.array([5.0]))[0]) == 5.0


def test_mlp_shapes() -> None:
    mlp = MLP((8, 4))
    params = mlp.init(jax.random.key(0), jnp.ones((2, 3)))
    out = mlp.apply(params, jnp.ones((2, 3)))
    assert out.shape == (2, 4)


def test_mlp_layer_norm() -> None:
    mlp = MLP((8, 4), layer_norm=True)
    params = mlp.init(jax.random.key(0), jnp.ones((2, 3)))
    out = mlp.apply(params, jnp.ones((2, 3)))
    assert out.shape == (2, 4)


def test_one_hot_embed_matches_flax_embed() -> None:
    """OneHotEmbed is a drop-in for nn.Embed: identical parameter tree
    (an `embedding` table with the same initializer distribution) and
    identical lookups — models can swap one for the other without
    breaking checkpoints or fused-spec param paths."""
    import flax.linen as nn

    from rl8_tpu.nn import OneHotEmbed
    from rl8_tpu.nn.modules.embeddings import one_hot_embed

    ref = nn.Embed(2, 4)
    ours = OneHotEmbed(2, 4)
    params = ref.init(jax.random.key(3), jnp.zeros((1,), jnp.int32))
    ours_params = ours.init(jax.random.key(3), jnp.zeros((1,), jnp.int32))
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        ours_params
    )
    assert params["params"]["embedding"].shape == (2, 4)
    np.testing.assert_allclose(
        np.asarray(params["params"]["embedding"]),
        np.asarray(ours_params["params"]["embedding"]),
    )
    idx = jnp.array([0, 1, 1, 0], jnp.int32)
    np.testing.assert_allclose(
        np.asarray(ref.apply(params, idx)),
        np.asarray(ours.apply(params, idx)),
        rtol=1e-6,
    )
    # The functional form used by fused-spec assembles matches too.
    np.testing.assert_allclose(
        np.asarray(one_hot_embed(params["params"]["embedding"], idx)),
        np.asarray(ref.apply(params, idx)),
        rtol=1e-6,
    )


def test_positional_embedding() -> None:
    pe = PositionalEmbedding(16, 32)
    params = pe.init(jax.random.key(0), jnp.zeros((2, 8, 16)))
    out = pe.apply(params, jnp.zeros((2, 8, 16)))
    assert out.shape == (2, 8, 16)
    # sin(0) = 0 at even dims of position 0, cos(0) = 1 at odd dims.
    assert float(out[0, 0, 0]) == 0.0
    assert float(out[0, 0, 1]) == 1.0


def test_sequential_skip_connection_kinds() -> None:
    import flax.linen as nn

    for kind in ("cat", "residual", None):
        mod = SequentialSkipConnection(
            embed_dim=8, kind=kind, layers=(lambda: nn.Dense(8),)
        )
        x = jnp.ones((2, 8))
        y = jnp.ones((2, 8))
        params = mod.init(jax.random.key(0), x, y)
        out = mod.apply(params, x, y)
        assert out.shape == (2, 8)


def test_self_attention() -> None:
    attn = SelfAttention(embed_dim=8, num_heads=2, hidden_dim=16)
    x = jnp.ones((2, 5, 8))
    params = attn.init(jax.random.key(0), x)
    out = attn.apply(params, x)
    assert out.shape == (2, 5, 8)
    # With a key padding mask.
    mask = jnp.zeros((2, 5), dtype=bool).at[:, -2:].set(True)
    out = attn.apply(params, x, mask)
    assert out.shape == (2, 5, 8)


def test_cross_attention() -> None:
    attn = CrossAttention(embed_dim=8, num_heads=2, hidden_dim=16)
    q = jnp.ones((2, 3, 8))
    kv = jnp.ones((2, 7, 8))
    params = attn.init(jax.random.key(0), q, kv)
    out = attn.apply(params, q, kv)
    assert out.shape == (2, 3, 8)


def test_self_attention_stack_and_sharing() -> None:
    x = jnp.ones((2, 4, 8))
    stack = SelfAttentionStack(embed_dim=8, num_layers=3)
    params = stack.init(jax.random.key(0), x)
    assert stack.apply(params, x).shape == (2, 4, 8)
    shared = SelfAttentionStack(embed_dim=8, num_layers=3, share_parameters=True)
    shared_params = shared.init(jax.random.key(0), x)
    n_leaves = len(jax.tree_util.tree_leaves(shared_params))
    n_unshared = len(jax.tree_util.tree_leaves(params))
    assert n_leaves < n_unshared


def test_pointer_network() -> None:
    net = PointerNetwork(embed_dim=8)
    dec = jnp.ones((2, 3, 8))
    enc = jnp.ones((2, 5, 8))
    params = net.init(jax.random.key(0), dec, enc)
    out = net.apply(params, dec, enc)
    assert out.shape == (2, 3, 5)
    # Logits are log-probs over the encoder axis.
    sums = jnp.exp(out).sum(-1)
    assert jnp.allclose(sums, 1.0, atol=1e-4)


@pytest.mark.slow
def test_perceiver_layers() -> None:
    q = jnp.ones((2, 4, 8))
    kv = jnp.ones((2, 10, 8))
    layer = PerceiverLayer(embed_dim=8, num_heads=2, hidden_dim=16, num_layers=1)
    params = layer.init(jax.random.key(0), q, kv)
    assert layer.apply(params, q, kv).shape == (2, 4, 8)
    io_layer = PerceiverIOLayer(
        embed_dim=8, output_seq_dim=6, num_heads=2, hidden_dim=16, num_layers=1
    )
    params = io_layer.init(jax.random.key(0), q, kv)
    assert io_layer.apply(params, q, kv).shape == (2, 6, 8)


def test_cross_attention_param_structure_independent_of_aliasing() -> None:
    """CrossAttention's parameter tree must not depend on whether the
    caller passes the same array object for q and kv (regression:
    object-identity check skipped kv_norm at init, crashing apply with
    distinct arrays)."""
    from rl8_tpu.nn import CrossAttention

    m = CrossAttention(embed_dim=8, num_heads=2)
    x = jax.random.normal(jax.random.key(0), (2, 3, 8))
    params_aliased = m.init(jax.random.key(1), x, x)["params"]
    params_distinct = m.init(jax.random.key(1), x, x + 0.0)["params"]
    assert jax.tree_util.tree_structure(
        params_aliased
    ) == jax.tree_util.tree_structure(params_distinct)
    assert "kv_norm" in params_aliased["block"]
    # Apply works with either aliasing, and kv REALLY routes through
    # kv_norm: perturbing kv (non-uniformly — LayerNorm absorbs constant
    # shifts) changes the output even when q is fixed.
    kv2 = x * jnp.arange(1, 9, dtype=jnp.float32)
    out_aliased = m.apply({"params": params_aliased}, x, x)
    out_distinct = m.apply({"params": params_aliased}, x, kv2)
    assert out_aliased.shape == out_distinct.shape == (2, 3, 8)
    assert not np.allclose(np.asarray(out_aliased), np.asarray(out_distinct))


def test_gelu_is_exact_erf_form() -> None:
    """The reference's torch nn.GELU is the exact erf GELU, not the tanh
    approximation jax defaults to."""
    import jax.scipy.special as jsp

    from rl8_tpu.nn import get_activation

    x = jnp.linspace(-3.0, 3.0, 31)
    exact = 0.5 * x * (1.0 + jsp.erf(x / jnp.sqrt(2.0)))
    np.testing.assert_allclose(
        np.asarray(get_activation("gelu")(x)), np.asarray(exact), atol=1e-6
    )


def test_ppo_losses_int_zero_entropy_coeff() -> None:
    """entropy_coeff=0 (int) skips the entropy term — SquashedNormal's
    entropy raises NotImplementedError and must not be evaluated."""
    from rl8_tpu.data import DataKeys
    from rl8_tpu.distributions import SquashedNormal
    from rl8_tpu.nn import ppo_losses

    B = 4
    features = {
        "mean": jnp.zeros((B, 1)),
        "log_std": jnp.zeros((B, 1)),
    }
    dist = SquashedNormal(features, None)
    actions = jnp.full((B, 1), 0.5)
    batch = {
        DataKeys.ACTIONS: actions,
        DataKeys.LOGP: dist.logp(actions),
        DataKeys.ADVANTAGES: jnp.ones((B, 1)),
        DataKeys.RETURNS: jnp.ones((B, 1)),
        DataKeys.VALUES: jnp.zeros((B, 1)),
    }
    losses = ppo_losses(batch, jnp.zeros((B, 1)), dist, entropy_coeff=0)
    assert float(losses["entropy"]) == 0.0


def test_apply_view_requirements_rejects_unknown_kind() -> None:
    from rl8_tpu.models import DefaultDiscreteModel
    from rl8_tpu.specs import Discrete, Unbounded

    model = DefaultDiscreteModel(Unbounded(3), Discrete(3, shape=(1,)))
    with pytest.raises(ValueError, match="view kind"):
        model.apply_view_requirements({}, kind="latest")


def test_small_window_attention_matches_flax() -> None:
    """The batch-last tiny-window attention layout is parameter- and
    numerics-compatible with flax's MultiHeadDotProductAttention: the
    SAME parameters applied through both implementations agree to
    float-reassociation tolerance, with and without padding masks."""
    import flax.linen as fnn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rl8_tpu.nn.modules.attention import _SmallWindowAttention

    B, S, E, H = 64, 5, 8, 4
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (B, S, E))
    small = _SmallWindowAttention(num_heads=H)
    flax_attn = fnn.MultiHeadDotProductAttention(num_heads=H)
    params = small.init(key, x, x)["params"]

    got = small.apply({"params": params}, x, x)
    want = flax_attn.apply({"params": params}, x, x, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # Padding mask: True = may attend (flax convention), same constant.
    mask = jax.random.bernoulli(jax.random.key(2), 0.7, (B, 1, S, S))
    mask = mask.at[..., 0].set(True)  # no fully-masked query rows
    got = small.apply({"params": params}, x, x, mask=mask)
    want = flax_attn.apply({"params": params}, x, x, x, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_small_window_gate_large_windows_use_flax_path() -> None:
    """Windows/embeds beyond the tiny-tile bounds keep flax's MXU-shaped
    attention; the two paths share parameter structure either way, so
    the gate never changes checkpoint layout."""
    import jax
    import jax.numpy as jnp

    from rl8_tpu.nn import SelfAttention

    big = SelfAttention(embed_dim=128, num_heads=4, hidden_dim=64)
    x = jnp.ones((2, 32, 128))
    params = big.init(jax.random.key(0), x)["params"]
    out = big.apply({"params": params}, x)
    assert out.shape == (2, 32, 128)
