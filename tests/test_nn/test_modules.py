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
