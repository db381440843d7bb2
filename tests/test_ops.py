"""Pallas kernel equivalence tests (interpreter mode on CPU)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from rl8_tpu.nn.functional import generalized_advantage_estimate
from rl8_tpu.ops import pallas_gae


def test_pallas_gae_matches_scan() -> None:
    T, B = 8, 12
    rewards = jax.random.normal(jax.random.key(0), (T, B, 1))
    values = jax.random.normal(jax.random.key(1), (T + 1, B, 1))
    for gamma, lam, scale in ((0.95, 0.95, 1.0), (0.99, 0.9, 3.7), (1.0, 1.0, 1.0)):
        ref_adv, ref_ret = generalized_advantage_estimate(
            rewards,
            values,
            gamma=gamma,
            gae_lambda=lam,
            normalize_advantages=False,
            reward_scale=scale,
        )
        adv, ret = pallas_gae(
            rewards,
            values,
            scale,
            gamma=gamma,
            gae_lambda=lam,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(adv), np.asarray(ref_adv), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ret), np.asarray(ref_ret), rtol=1e-5, atol=1e-5
        )


def test_pallas_gae_large_batch_padding() -> None:
    """Batch sizes above one tile exercise the grid and pad/slice paths."""
    T, B = 4, 600
    rewards = jnp.ones((T, B, 1))
    values = jnp.zeros((T + 1, B, 1))
    adv, ret = pallas_gae(
        rewards, values, 1.0, gamma=1.0, gae_lambda=1.0, interpret=True
    )
    expected = jnp.arange(T, 0, -1, dtype=jnp.float32).reshape(T, 1, 1)
    np.testing.assert_allclose(
        np.asarray(adv),
        np.broadcast_to(np.asarray(expected), (T, B, 1)) / (1 + 1e-8),
        rtol=1e-5,
    )


# ----------------------------------------------------------------------
# Row packing
# ----------------------------------------------------------------------


def test_pack_rows_bit_exact_round_trip() -> None:
    """pack/unpack restores every leaf bit-exactly across dtypes."""
    from rl8_tpu.ops import pack_rows

    key = jax.random.key(0)
    tree = {
        "f": jax.random.normal(key, (10, 3)),
        "i": jnp.arange(10, dtype=jnp.int32).reshape(10, 1),
        "b": jnp.arange(10) % 2 == 0,
        "nested": {"x": jax.random.normal(key, (10, 2, 4))},
        "scalar_rows": jnp.arange(10, dtype=jnp.float32),
    }
    packed, unpack = pack_rows(tree)
    assert packed.shape[0] == 10 and packed.dtype == jnp.int32
    out = unpack(packed)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        tree,
        out,
    )
    # Unpacking a row selection equals selecting then unpacking.
    sel = unpack(packed[2:5])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a[2:5]), np.asarray(b)),
        tree,
        sel,
    )


def test_pack_rows_rejects_wide_dtypes() -> None:
    from rl8_tpu.ops import pack_rows

    with pytest.raises(TypeError):
        pack_rows({"x": jnp.zeros((4, 2), dtype=jnp.complex64)})


# ----------------------------------------------------------------------
# Fused default-model forward/backward (interpret mode)
# ----------------------------------------------------------------------


def _rel_close(a, b, rel: float) -> None:
    a, b = np.asarray(a), np.asarray(b)
    scale = np.max(np.abs(a)) + 1e-6
    np.testing.assert_allclose(a, b, atol=rel * scale, rtol=rel)


def _norm_close(a, b, rel: float) -> None:
    # Frobenius-relative check: robust to isolated relu-boundary flips
    # caused by bf16-multiply rounding in the recompute backward.
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    err = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
    assert err < rel, f"relative norm error {err} >= {rel}"


def _perturbed_params(model, batch):
    from rl8_tpu.data import DataKeys  # noqa: F401

    params = model.init(jax.random.key(0), batch)["params"]
    return jax.tree_util.tree_map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.key(2), p.shape),
        params,
    )


@pytest.mark.parametrize("n_rows", [16, 37])  # 37 exercises row masking
@pytest.mark.slow
def test_fused_apply_matches_flax_discrete(n_rows: int) -> None:
    """Fused Pallas forward/backward equals the flax default discrete
    model to matmul (bf16-multiply) precision."""
    from rl8_tpu.data import DataKeys
    from rl8_tpu.models import DefaultDiscreteModel
    from rl8_tpu.ops.fused_mlp import fused_default_apply
    from rl8_tpu.specs import Discrete, Unbounded

    model = DefaultDiscreteModel(
        Unbounded(5), Discrete(3, shape=(2,)), hiddens=(32, 16)
    )
    batch = {DataKeys.OBS: jax.random.normal(jax.random.key(1), (n_rows, 5))}
    params = _perturbed_params(model, batch)

    f_ref, v_ref = model.apply({"params": params}, batch)
    f_fused, v_fused = fused_default_apply(model, params, batch, interpret=True)
    assert f_fused["logits"].shape == (n_rows, 2, 3)
    _rel_close(f_ref["logits"], f_fused["logits"], 2e-2)
    _rel_close(v_ref, v_fused, 2e-2)

    def loss(p, fused):
        if fused:
            f, v = fused_default_apply(model, p, batch, interpret=True)
        else:
            f, v = model.apply({"params": p}, batch)
        return jnp.sum(jnp.sin(f["logits"])) + jnp.sum(v * v)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_fused = jax.grad(lambda p: loss(p, True))(params)
    jax.tree_util.tree_map(lambda a, b: _norm_close(a, b, 8e-2), g_ref, g_fused)


@pytest.mark.slow
def test_fused_apply_matches_flax_continuous() -> None:
    from rl8_tpu.data import DataKeys
    from rl8_tpu.models import DefaultContinuousModel
    from rl8_tpu.ops.fused_mlp import fused_default_apply
    from rl8_tpu.specs import Unbounded

    model = DefaultContinuousModel(Unbounded(4), Unbounded(2), hiddens=(24, 24))
    batch = {DataKeys.OBS: jax.random.normal(jax.random.key(1), (40, 4))}
    params = _perturbed_params(model, batch)

    f_ref, v_ref = model.apply({"params": params}, batch)
    f_fused, v_fused = fused_default_apply(model, params, batch, interpret=True)
    _rel_close(f_ref["mean"], f_fused["mean"], 2e-2)
    _rel_close(f_ref["log_std"], f_fused["log_std"], 2e-2)
    _rel_close(v_ref, v_fused, 2e-2)

    def loss(p, fused):
        if fused:
            f, v = fused_default_apply(model, p, batch, interpret=True)
        else:
            f, v = model.apply({"params": p}, batch)
        return jnp.sum(jnp.sin(f["mean"])) + jnp.sum(f["log_std"]) + jnp.sum(v * v)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_fused = jax.grad(lambda p: loss(p, True))(params)
    jax.tree_util.tree_map(lambda a, b: _norm_close(a, b, 8e-2), g_ref, g_fused)


def test_fused_apply_obs_gradient_flows() -> None:
    """The custom VJP also produces the input (observation) gradient."""
    from rl8_tpu.data import DataKeys
    from rl8_tpu.models import DefaultDiscreteModel
    from rl8_tpu.ops.fused_mlp import fused_default_apply
    from rl8_tpu.specs import Discrete, Unbounded

    model = DefaultDiscreteModel(
        Unbounded(5), Discrete(3, shape=(2,)), hiddens=(32, 16)
    )
    obs = jax.random.normal(jax.random.key(1), (16, 5))
    params = _perturbed_params(model, {"obs": obs})

    def out_sum(o, fused):
        batch = {DataKeys.OBS: o}
        if fused:
            f, _ = fused_default_apply(model, params, batch, interpret=True)
        else:
            f, _ = model.apply({"params": params}, batch)
        return jnp.sum(jnp.sin(f["logits"]))

    gx_ref = jax.grad(lambda o: out_sum(o, False))(obs)
    gx_fused = jax.grad(lambda o: out_sum(o, True))(obs)
    _norm_close(gx_ref, gx_fused, 8e-2)


def test_supports_fused_apply_gating() -> None:
    from rl8_tpu.models import DefaultDiscreteModel, GenericModel
    from rl8_tpu.ops.fused_mlp import supports_fused_apply
    from rl8_tpu.specs import Discrete, Unbounded

    obs_spec, act_spec = Unbounded(5), Discrete(3, shape=(1,))
    assert supports_fused_apply(DefaultDiscreteModel(obs_spec, act_spec))
    assert not supports_fused_apply(
        DefaultDiscreteModel(obs_spec, act_spec, activation_fn="gelu")
    )
    assert not supports_fused_apply(
        DefaultDiscreteModel(obs_spec, act_spec, bias=False)
    )

    class Custom(DefaultDiscreteModel):
        pass

    assert not supports_fused_apply(Custom(obs_spec, act_spec))


# ----------------------------------------------------------------------
# Fully-fused PPO update kernel (interpret mode)
# ----------------------------------------------------------------------


@pytest.mark.parametrize(
    "kind,use_entropy,dual,N",
    [
        # N=53: non-multiple-of-8 exercises row masking (the [tile, 1]
        # loss-chain layout). N=256: a full 128-divisible tile exercises
        # the dense-lane loss-chain repack (_dense_rows).
        ("discrete", False, None, 53),
        ("discrete", True, 3.0, 53),
        ("continuous", False, None, 53),
        ("continuous", True, 3.0, 53),
        ("squashed", False, 2.0, 53),
        ("discrete", True, 3.0, 256),
        ("continuous", True, 3.0, 256),
        ("squashed", False, 2.0, 256),
    ],
)
@pytest.mark.slow
def test_fused_ppo_grads_match_autodiff(kind, use_entropy, dual, N) -> None:
    """The fused PPO kernel reproduces ppo_losses + jax.grad through the
    flax model: losses, approximate KL, and every parameter gradient."""
    from rl8_tpu.data import DataKeys
    from rl8_tpu.distributions import Categorical, Normal
    from rl8_tpu.models import DefaultContinuousModel, DefaultDiscreteModel
    from rl8_tpu.nn import ppo_losses
    from rl8_tpu.ops import pack_rows
    from rl8_tpu.ops.fused_ppo import PPOLossConfig, fused_ppo_grads
    from rl8_tpu.specs import Discrete, Unbounded

    if kind == "discrete":
        model = DefaultDiscreteModel(
            Unbounded(3), Discrete(4, shape=(2,)), hiddens=(32, 16)
        )
        dist_cls = Categorical
        actions = jax.random.randint(jax.random.key(7), (N, 2), 0, 4)
    elif kind == "squashed":
        from rl8_tpu.distributions import SquashedNormal

        model = DefaultContinuousModel(Unbounded(4), Unbounded(2), hiddens=(24, 24))
        dist_cls = SquashedNormal
        actions = jnp.tanh(jax.random.normal(jax.random.key(8), (N, 2)))
    else:
        model = DefaultContinuousModel(Unbounded(4), Unbounded(2), hiddens=(24, 24))
        dist_cls = Normal
        actions = jax.random.normal(jax.random.key(8), (N, 2))

    obs = jax.random.normal(jax.random.key(3), (N, model.observation_spec.shape[0]))
    params = model.init(jax.random.key(0), {DataKeys.OBS: obs})["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.key(2), p.shape), params
    )
    flat = {
        DataKeys.ACTIONS: actions,
        DataKeys.LOGP: 0.1 * jax.random.normal(jax.random.key(4), (N, 1)),
        DataKeys.ADVANTAGES: jax.random.normal(jax.random.key(5), (N, 1)),
        DataKeys.RETURNS: jax.random.normal(jax.random.key(6), (N, 1)),
        DataKeys.VIEWS: {DataKeys.OBS: obs},
    }
    packed, unpack = pack_rows(flat)
    ec = 0.013 if use_entropy else 0.0
    accum = 3
    cfg = PPOLossConfig(
        clip_param=0.2, vf_clip_param=1.5, vf_coeff=0.9,
        dual_clip_param=dual, n_rows=N, accum=accum, use_entropy=use_entropy,
        squashed=(kind == "squashed"),
    )

    def loss_fn(p):
        f, v = model.apply({"params": p}, {DataKeys.OBS: obs})
        dist = dist_cls(f, model)
        losses = ppo_losses(
            flat, v, dist, clip_param=0.2, dual_clip_param=dual,
            entropy_coeff=ec if use_entropy else 0.0,
            vf_clip_param=1.5, vf_coeff=0.9,
        )
        lr = dist.logp(flat[DataKeys.ACTIONS]) - flat[DataKeys.LOGP]
        kl = jnp.mean((jnp.exp(lr) - 1) - lr)
        return losses["total"] / accum, (losses, kl)

    (_, (ref_losses, ref_kl)), ref_grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)
    losses, kl, grads = fused_ppo_grads(
        model, params, packed, unpack, ec, cfg, interpret=True
    )

    for k in ("entropy", "policy", "vf", "total"):
        a, b = float(ref_losses[k]), float(losses[k])
        assert abs(a - b) < 2e-2 * (abs(a) + 1e-2), (k, a, b)
    assert abs(float(ref_kl) - float(kl)) < 2e-2 * (abs(float(ref_kl)) + 1e-2)
    jax.tree_util.tree_map(lambda a, b: _norm_close(a, b, 8e-2), ref_grads, grads)


def test_supports_fused_update_gating() -> None:
    from rl8_tpu.distributions import Categorical, Normal, SquashedNormal
    from rl8_tpu.models import DefaultContinuousModel, DefaultDiscreteModel
    from rl8_tpu.ops.fused_ppo import supports_fused_update
    from rl8_tpu.specs import Discrete, Unbounded

    disc = DefaultDiscreteModel(Unbounded(3), Discrete(4, shape=(1,)))
    cont = DefaultContinuousModel(Unbounded(3), Unbounded(2))
    assert supports_fused_update(disc, Categorical)
    assert not supports_fused_update(disc, Normal)
    assert supports_fused_update(cont, Normal)
    # SquashedNormal has no entropy: fused only with a zero entropy bonus.
    assert not supports_fused_update(cont, SquashedNormal)
    assert supports_fused_update(cont, SquashedNormal, zero_entropy=True)
    assert not supports_fused_update(cont, Categorical)


# ----------------------------------------------------------------------
# Fused act (rollout sampling) kernel
# ----------------------------------------------------------------------


@pytest.mark.slow
def test_fused_act_deterministic_and_logp_consistency() -> None:
    """Deterministic fused acting equals the distribution's argmax/mean
    path, and stochastic log-probs are self-consistent with the returned
    actions. (Sampling *statistics* require the hardware PRNG and are
    validated on-TPU; the interpreter PRNG is not distributionally
    faithful.)"""
    from jax.experimental.pallas import tpu as pltpu

    from rl8_tpu.data import DataKeys
    from rl8_tpu.distributions import Categorical, Normal
    from rl8_tpu.models import DefaultContinuousModel, DefaultDiscreteModel
    from rl8_tpu.ops.fused_act import fused_act
    from rl8_tpu.specs import Discrete, Unbounded

    obs = jax.random.normal(jax.random.key(1), (64, 3))
    batch = {DataKeys.OBS: obs}

    model = DefaultDiscreteModel(
        Unbounded(3), Discrete(3, shape=(2,)), hiddens=(32, 16)
    )
    params = model.init(jax.random.key(0), batch)["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.3 * jax.random.normal(jax.random.key(2), p.shape), params
    )
    f_ref, v_ref = model.apply({"params": params}, batch)
    dist = Categorical(f_ref, model)
    with pltpu.force_tpu_interpret_mode():
        a, lp, v = fused_act(
            model, params, batch, jax.random.key(5), deterministic=True
        )
        a_s, lp_s, _ = fused_act(model, params, batch, jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(dist.deterministic_sample()))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(dist.logp(a)), rtol=2e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=2e-2, atol=3e-2)
    np.testing.assert_allclose(
        np.asarray(lp_s), np.asarray(dist.logp(a_s)), rtol=2e-2, atol=3e-2
    )

    modelc = DefaultContinuousModel(Unbounded(3), Unbounded(2), hiddens=(24, 24))
    paramsc = modelc.init(jax.random.key(0), batch)["params"]
    fc, vc_ref = modelc.apply({"params": paramsc}, batch)
    distc = Normal(fc, modelc)
    with pltpu.force_tpu_interpret_mode():
        ac, lpc, vc = fused_act(
            modelc, paramsc, batch, jax.random.key(5), deterministic=True
        )
    np.testing.assert_allclose(np.asarray(ac), np.asarray(fc["mean"]), rtol=2e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(lpc), np.asarray(distc.logp(ac)), rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(vc_ref), rtol=2e-2, atol=3e-2)


# ----------------------------------------------------------------------
# Fused recurrent (LSTM) PPO update kernel (interpret mode)
# ----------------------------------------------------------------------


@pytest.mark.parametrize(
    "kind,use_entropy,dual",
    [
        ("discrete", False, None),
        ("discrete", True, 3.0),
        ("continuous", True, 2.0),
        ("squashed", False, None),
        ("discrete2layer", False, None),
    ],
)
@pytest.mark.slow
def test_fused_rnn_ppo_grads_match_autodiff(kind, use_entropy, dual) -> None:
    """The fused LSTM-BPTT PPO kernel reproduces ppo_losses + jax.grad
    through the flax recurrent model for every parameter."""
    from rl8_tpu.data import DataKeys
    from rl8_tpu.distributions import Categorical, Normal, SquashedNormal
    from rl8_tpu.models import (
        DefaultContinuousRecurrentModel,
        DefaultDiscreteRecurrentModel,
    )
    from rl8_tpu.nn import ppo_losses
    from rl8_tpu.ops import pack_rows
    from rl8_tpu.ops.fused_ppo import PPOLossConfig
    from rl8_tpu.ops.fused_rnn_ppo import fused_rnn_ppo_grads
    from rl8_tpu.specs import Discrete, Unbounded

    N, L = 37, 4  # non-multiple-of-8 rows exercise masking
    num_layers = 2 if kind == "discrete2layer" else 1
    if kind.startswith("discrete"):
        model = DefaultDiscreteRecurrentModel(
            Unbounded(3), Discrete(3, shape=(2,)), hidden_size=16,
            num_layers=num_layers,
        )
        dist_cls = Categorical
        actions = jax.random.randint(jax.random.key(7), (N, L, 2), 0, 3)
    else:
        model = DefaultContinuousRecurrentModel(
            Unbounded(3), Unbounded(2), hidden_size=16
        )
        dist_cls = SquashedNormal if kind == "squashed" else Normal
        actions = jax.random.normal(jax.random.key(8), (N, L, 2)) * 0.5
        if kind == "squashed":
            actions = jnp.tanh(actions)

    obs = jax.random.normal(jax.random.key(3), (N, L, 3))
    states = {
        DataKeys.HIDDEN_STATES: 0.3
        * jax.random.normal(jax.random.key(9), (N, num_layers, 16)),
        DataKeys.CELL_STATES: 0.3
        * jax.random.normal(jax.random.key(10), (N, num_layers, 16)),
    }
    params = model.init(jax.random.key(0), {DataKeys.OBS: obs}, states)["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.key(2), p.shape), params
    )
    flat = {
        DataKeys.OBS: obs,
        DataKeys.STATES: states,
        DataKeys.ACTIONS: actions,
        DataKeys.LOGP: 0.1 * jax.random.normal(jax.random.key(4), (N, L, 1)),
        DataKeys.ADVANTAGES: jax.random.normal(jax.random.key(5), (N, L, 1)),
        DataKeys.RETURNS: jax.random.normal(jax.random.key(6), (N, L, 1)),
    }
    packed, unpack = pack_rows(flat)
    ec = 0.013 if use_entropy else 0.0
    accum = 2
    cfg = PPOLossConfig(
        clip_param=0.2, vf_clip_param=1.5, vf_coeff=0.9,
        dual_clip_param=dual, n_rows=N, accum=accum,
        use_entropy=use_entropy, squashed=(kind == "squashed"),
    )

    def loss_fn(p):
        (f, v), _ = model.apply({"params": p}, {DataKeys.OBS: obs}, states)
        dist = dist_cls(f, model)
        flat_mb = {
            k: flat[k].reshape(-1, *flat[k].shape[2:])
            for k in (
                DataKeys.ACTIONS,
                DataKeys.LOGP,
                DataKeys.ADVANTAGES,
                DataKeys.RETURNS,
            )
        }
        losses = ppo_losses(
            flat_mb, v, dist, clip_param=0.2, dual_clip_param=dual,
            entropy_coeff=ec if use_entropy else 0.0,
            vf_clip_param=1.5, vf_coeff=0.9,
        )
        lr = dist.logp(flat_mb[DataKeys.ACTIONS]) - flat_mb[DataKeys.LOGP]
        kl = jnp.mean((jnp.exp(lr) - 1) - lr)
        return losses["total"] / accum, (losses, kl)

    (_, (ref_losses, ref_kl)), ref_grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)
    losses, kl, grads = fused_rnn_ppo_grads(
        model, params, packed, unpack, ec, cfg, interpret=True
    )

    for k in ("entropy", "policy", "vf", "total"):
        a, b = float(ref_losses[k]), float(losses[k])
        assert abs(a - b) < 3e-2 * (abs(a) + 1e-2), (k, a, b)
    assert abs(float(ref_kl) - float(kl)) < 3e-2 * (abs(float(ref_kl)) + 1e-2)
    jax.tree_util.tree_map(lambda a, b: _norm_close(a, b, 0.1), ref_grads, grads)


def test_supports_fused_rnn_update_gating() -> None:
    from rl8_tpu.distributions import Categorical, Normal, SquashedNormal
    from rl8_tpu.models import (
        DefaultContinuousRecurrentModel,
        DefaultDiscreteRecurrentModel,
    )
    from rl8_tpu.ops.fused_rnn_ppo import supports_fused_rnn_update
    from rl8_tpu.specs import Discrete, Unbounded

    disc = DefaultDiscreteRecurrentModel(Unbounded(3), Discrete(3, shape=(1,)))
    cont = DefaultContinuousRecurrentModel(Unbounded(3), Unbounded(2))
    assert supports_fused_rnn_update(disc, Categorical)
    assert not supports_fused_rnn_update(disc, Normal)
    assert supports_fused_rnn_update(cont, Normal)
    assert not supports_fused_rnn_update(cont, SquashedNormal)
    assert supports_fused_rnn_update(cont, SquashedNormal, zero_entropy=True)
    # Stacked LSTMs are fused up to 8 layers; deeper falls back.
    deep = DefaultDiscreteRecurrentModel(
        Unbounded(3), Discrete(3, shape=(1,)), num_layers=2
    )
    assert supports_fused_rnn_update(deep, Categorical)
    too_deep = DefaultDiscreteRecurrentModel(
        Unbounded(3), Discrete(3, shape=(1,)), num_layers=9
    )
    assert not supports_fused_rnn_update(too_deep, Categorical)
    # Integer observations can't ride the packed-row f32 bitcast
    # transport (same gate as the feedforward kernels).
    int_obs = DefaultDiscreteRecurrentModel(
        Unbounded(3, dtype=jnp.int32), Discrete(3, shape=(1,))
    )
    assert not supports_fused_rnn_update(int_obs, Categorical)
    # Very wide cells fail weight residency and fall back.
    wide = DefaultDiscreteRecurrentModel(
        Unbounded(3), Discrete(3, shape=(1,)), hidden_size=2048
    )
    assert not supports_fused_rnn_update(wide, Categorical)
    # Very wide HEADS (large-vocabulary action spaces) also count
    # against residency: the update kernel holds head params, their
    # accumulators, and transposed copies in VMEM.
    wide_head = DefaultDiscreteRecurrentModel(
        Unbounded(3), Discrete(40000, shape=(1,))
    )
    assert not supports_fused_rnn_update(wide_head, Categorical)
    medium_head = DefaultDiscreteRecurrentModel(
        Unbounded(3), Discrete(1000, shape=(1,))
    )
    assert supports_fused_rnn_update(medium_head, Categorical)


def test_vmem_aware_tiles_shrink_for_big_configs() -> None:
    """The recurrent tile helpers charge residents/width against the
    VMEM budget: defaults keep their measured tiles, deep/wide configs
    shrink rather than overshooting ``vmem_limit_bytes``."""
    from rl8_tpu.ops.fused_rnn_ppo import _rnn_tile
    from rl8_tpu.ops.gae import gae_fits_vmem

    # Default recurrent config: unchanged by the resident charge.
    small_resident = 4 * 2 * (4 * 256 * (3 + 256 + 1))
    assert _rnn_tile(8192, 256, 4, 1, resident_bytes=small_resident) == 512
    # H=768, L=2 passes the weight-residency gate (~57MB residents) but
    # must shrink its BPTT saves below the leftover budget.
    resident = 4 * 2 * (4 * 768 * (3 + 768 + 1) + 4 * 768 * (2 * 768 + 1))
    tile = _rnn_tile(8192, 768, 4, 2, resident_bytes=resident)
    saves = tile * 8 * 4 * 768 * 4 * 2
    assert resident + saves <= 88 * 1024 * 1024
    assert tile >= 8

    assert gae_fits_vmem(32)
    assert gae_fits_vmem(512)
    assert not gae_fits_vmem(8192)


@pytest.mark.slow
def test_fused_rnn_act_deterministic_matches_flax() -> None:
    """The recurrent act kernel's deterministic path equals the flax
    cell + argmax/mean path, including the carried LSTM state."""
    from jax.experimental.pallas import tpu as pltpu

    from rl8_tpu.data import DataKeys
    from rl8_tpu.distributions import Categorical
    from rl8_tpu.models import DefaultDiscreteRecurrentModel
    from rl8_tpu.ops.fused_rnn_act import fused_rnn_act
    from rl8_tpu.specs import Discrete, Unbounded

    model = DefaultDiscreteRecurrentModel(
        Unbounded(3), Discrete(3, shape=(2,)), hidden_size=16
    )
    B = 24
    obs = jax.random.normal(jax.random.key(1), (B, 3))
    states = {
        DataKeys.HIDDEN_STATES: 0.3 * jax.random.normal(jax.random.key(2), (B, 1, 16)),
        DataKeys.CELL_STATES: 0.3 * jax.random.normal(jax.random.key(3), (B, 1, 16)),
    }
    batch = {DataKeys.OBS: obs[:, None]}
    params = model.init(jax.random.key(0), batch, states)["params"]
    (f_ref, v_ref), new_ref = model.apply({"params": params}, batch, states)
    dist = Categorical(f_ref, model)

    with pltpu.force_tpu_interpret_mode():
        a, lp, v, new_states = fused_rnn_act(
            model, params, obs, states, jax.random.key(5), deterministic=True
        )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(dist.deterministic_sample()))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(dist.logp(a)), rtol=2e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=2e-2, atol=3e-2)
    for k in (DataKeys.HIDDEN_STATES, DataKeys.CELL_STATES):
        np.testing.assert_allclose(
            np.asarray(new_states[k]), np.asarray(new_ref[k]), rtol=2e-2, atol=3e-2
        )


def test_fused_gates_reject_amp_models() -> None:
    """Models with an explicit compute dtype (enable_amp) must be
    rejected by BOTH fused-kernel gates, forcing the autodiff path that
    honors the requested dtype."""
    import jax.numpy as jnp

    from rl8_tpu.distributions import Categorical
    from rl8_tpu.models import DefaultDiscreteModel, DefaultDiscreteRecurrentModel
    from rl8_tpu.ops.fused_mlp import supports_fused_apply
    from rl8_tpu.ops.fused_rnn_ppo import supports_fused_rnn_update
    from rl8_tpu.specs import Discrete, Unbounded

    obs, act = Unbounded(1), Discrete(2, shape=(1,))
    assert supports_fused_apply(DefaultDiscreteModel(obs, act))
    assert not supports_fused_apply(
        DefaultDiscreteModel(obs, act, dtype=jnp.bfloat16)
    )
    assert supports_fused_rnn_update(
        DefaultDiscreteRecurrentModel(obs, act), Categorical
    )
    assert not supports_fused_rnn_update(
        DefaultDiscreteRecurrentModel(obs, act, dtype=jnp.bfloat16), Categorical
    )


def test_fused_act_stochastic_paths_trace() -> None:
    """Tracing (jax.eval_shape) the STOCHASTIC sampling branches of both
    act kernels catches structural kernel bugs on CPU. The hardware-PRNG
    body can't execute faithfully off-TPU (distribution checks live in
    `-m tpu`), but pallas traces the kernel to a jaxpr regardless, which
    is where undefined locals / bad ref indexing surface."""
    import jax
    import jax.numpy as jnp

    from rl8_tpu.data import DataKeys
    from rl8_tpu.ops.fused_act import fused_act
    from rl8_tpu.ops.fused_rnn_act import fused_rnn_act
    from rl8_tpu.policies import Policy, RecurrentPolicy
    from rl8_tpu.specs import Discrete, Unbounded

    key = jax.random.key(0)
    for action_spec, squashed in (
        (Discrete(3, shape=(1,)), False),
        (Unbounded(2), False),
        (Unbounded(2), True),
    ):
        policy = Policy(Unbounded(4), action_spec)
        params = policy.init_params(key)
        batch = {DataKeys.OBS: jnp.zeros((16, 4))}
        jax.eval_shape(
            lambda p, b: fused_act(
                policy.model, p, b, key, deterministic=False, squashed=squashed
            ),
            params,
            batch,
        )

    rec = RecurrentPolicy(Unbounded(4), Discrete(3, shape=(1,)))
    params = rec.init_params(key)
    states = rec.init_states(16)
    jax.eval_shape(
        lambda p, o, s: fused_rnn_act(
            rec.model, p, o, s, key, deterministic=False
        ),
        params,
        jnp.zeros((16, 4)),
        states,
    )


# ----------------------------------------------------------------------
# LayerNorm chains + custom-model fused apply (interpret mode)
# ----------------------------------------------------------------------


def test_fused_chains_layer_norm_exact_on_f32_path() -> None:
    """LayerNorm layers in `fused_chains` match flax's
    `MLP(layer_norm=True)` + trailing activation EXACTLY (f32) when all
    matmul dims take the VPU f32 path — isolates the LN forward/backward
    math from bf16 matmul rounding."""
    import flax.linen as nn

    from rl8_tpu.nn import MLP
    from rl8_tpu.ops.fused_mlp import fused_chains

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = jax.nn.relu(MLP((5, 5), layer_norm=True, name="torso")(x))
            return nn.Dense(3, name="head")(h)

    x = jax.random.normal(jax.random.key(1), (32, 4), jnp.float32)
    ref = Ref()
    params = ref.init(jax.random.key(0), x)["params"]

    def chains_from(p):
        sub = p["torso"]
        return (
            (
                (
                    (sub["Dense_0"]["kernel"], sub["Dense_0"]["bias"],
                     sub["LayerNorm_0"]["scale"], sub["LayerNorm_0"]["bias"]),
                    (sub["Dense_1"]["kernel"], sub["Dense_1"]["bias"]),
                ),
                ((p["head"]["kernel"], p["head"]["bias"]),),
            ),
        )

    out_ref = ref.apply({"params": params}, x)
    ((out_fused,),) = fused_chains("relu", True, x, chains_from(params))
    np.testing.assert_allclose(out_ref, out_fused, atol=5e-6)

    def loss_ref(p, x):
        return jnp.sum(jnp.sin(ref.apply({"params": p}, x)))

    def loss_fused(p, x):
        ((o,),) = fused_chains("relu", True, x, chains_from(p))
        return jnp.sum(jnp.sin(o))

    g_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_fused, gx_fused = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-5), g_ref, g_fused
    )
    np.testing.assert_allclose(gx_ref, gx_fused, atol=2e-5)


def _mule_batch(B: int = 48, L: int = 4) -> dict:
    from rl8_tpu.data import DataKeys

    return {
        DataKeys.OBS: {
            "action_mask": jnp.ones((B, 3), jnp.int32).at[: B // 2, 1].set(0),
            "invested": jax.random.randint(jax.random.key(2), (B, 1), 0, 2),
            "LOG_CHANGE(price)": {
                DataKeys.INPUTS: jax.random.normal(
                    jax.random.key(3), (B, L + 1, 1)
                ),
                DataKeys.PADDING_MASK: jnp.zeros((B, L + 1), bool),
            },
            "LOG_CHANGE(price, position)": jax.random.normal(
                jax.random.key(4), (B, 1)
            ),
        }
    }


def _mule(hiddens=(32, 32), **kw):
    from examples.algotrading.models import MischievousMule
    from rl8_tpu.specs import Composite, Discrete, Unbounded

    obs_spec = Composite(
        {
            "action_mask": Discrete(2, shape=(3,), dtype=jnp.int32),
            "invested": Discrete(2, shape=(1,), dtype=jnp.int32),
            "LOG_CHANGE(price)": Unbounded(1),
            "LOG_CHANGE(price, position)": Unbounded(1),
        }
    )
    return MischievousMule(obs_spec, Discrete(3, shape=(1,)), hiddens=hiddens, **kw)


@pytest.mark.slow
def test_fused_custom_apply_matches_flax_mule() -> None:
    """`fused_custom_apply` on the algotrading MischievousMule (composite
    obs assembly + embedding in XLA, LayerNorm-MLP chains in the kernel,
    action masking in finalize) equals the flax apply to matmul
    precision — forward AND gradients, including the embedding table's
    gradient through the kernel's dx."""
    from rl8_tpu.data import DataKeys
    from rl8_tpu.ops.fused_mlp import fused_custom_apply, supports_fused_apply

    model = _mule()
    assert supports_fused_apply(model)
    batch = _mule_batch()
    params = model.init(jax.random.key(0), batch)["params"]

    f_ref, v_ref = model.apply({"params": params}, batch)
    f_fused, v_fused = fused_custom_apply(model, params, batch, interpret=True)
    # Masked entries are FMIN-clipped in BOTH (finalize adds the model's
    # own -inf mask).
    assert bool(jnp.all(f_fused["logits"][: 48 // 2, :, 1] < -1e37))
    assert bool(jnp.all(f_ref["logits"][: 48 // 2, :, 1] < -1e37))
    valid = f_ref["logits"] > -1e37
    _rel_close(
        jnp.where(valid, f_ref["logits"], 0.0),
        jnp.where(valid, f_fused["logits"], 0.0),
        2e-2,
    )
    _rel_close(v_ref, v_fused, 2e-2)

    def loss(p, fused):
        if fused:
            f, v = fused_custom_apply(model, p, batch, interpret=True)
        else:
            f, v = model.apply({"params": p}, batch)
        lg = jnp.where(f["logits"] > -1e37, f["logits"], 0.0)
        return jnp.mean(jnp.sin(lg)) + jnp.mean(v * v)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_fused = jax.grad(lambda p: loss(p, True))(params)
    jax.tree_util.tree_map(lambda a, b: _norm_close(a, b, 8e-2), g_ref, g_fused)


def test_supports_fused_apply_classification() -> None:
    """Spec-declaring custom models are fused-apply capable — including
    the bf16 AMP opt-in — while arbitrary customs and non-bf16 dtypes
    are not."""
    from rl8_tpu.models import GenericModel
    from rl8_tpu.ops.fused_mlp import supports_fused_apply

    assert supports_fused_apply(_mule())
    assert supports_fused_apply(_mule(dtype=jnp.bfloat16))
    assert not supports_fused_apply(_mule(dtype=jnp.float16))

    class NoSpec(GenericModel):
        def __call__(self, batch):
            raise NotImplementedError

    from rl8_tpu.specs import Discrete, Unbounded

    assert not supports_fused_apply(NoSpec(Unbounded(3), Discrete(2, shape=(1,))))

    # A bare ``Model`` subclass (no dtype/activation_fn fields — the
    # documented docs/custom-models.md pattern) declaring a spec must
    # gate cleanly rather than crash on the missing attributes; without
    # an activation_fn the kernels can't pick a backward, so it falls
    # back unfused.
    from rl8_tpu.models import Model
    from rl8_tpu.ops.fused_mlp import FusedApplySpec

    spec = FusedApplySpec(
        assemble=lambda params, batch: batch,
        finalize=lambda batch, outs: outs,
        chain_names=(("feature_model", ("feature_head",)),),
    )

    class BareSpecModel(Model):
        def __call__(self, batch):
            raise NotImplementedError

        def fused_apply_spec(self):
            return spec

    class ReluSpecModel(BareSpecModel):
        activation_fn: str = "relu"

    obs, act = Unbounded(3), Discrete(2, shape=(1,))
    assert not supports_fused_apply(BareSpecModel(obs, act))
    assert supports_fused_apply(ReluSpecModel(obs, act))


# ----------------------------------------------------------------------
# VMEM-aware tiling and the wide-model fallback gate
# ----------------------------------------------------------------------


def _fake_chains(d_in: int, width: int, n_layers: int = 2):
    """Twin torso/head chains of a given width (shape-only params)."""
    chains = []
    for _ in range(2):
        layers = []
        d = d_in
        for _ in range(n_layers):
            layers.append((jnp.zeros((d, width)), jnp.zeros((width,))))
            d = width
        chains.append((tuple(layers), ((jnp.zeros((width, 3)), jnp.zeros((3,))),)))
    return tuple(chains)


def test_row_tile_shrinks_with_width() -> None:
    """Wide chains shrink the row tile to keep the activation working set
    inside the VMEM budget; the small-model regime keeps the 4096 tile."""
    from rl8_tpu.ops.fused_mlp import _chain_mem, _row_tile

    small = _chain_mem(_fake_chains(4, 256))[1]
    wide = _chain_mem(_fake_chains(4, 1024))[1]
    assert _row_tile(1 << 20, small) == 4096
    t = _row_tile(1 << 20, wide)
    assert 8 <= t < 4096 and t % 8 == 0
    # The chosen tile actually respects the budget.
    assert 4 * wide * t <= 48 * 1024 * 1024


def test_chains_fit_vmem_rejects_huge_models() -> None:
    """≤1024-wide twin torsos fit; 4096-wide (≈270MB params+grads) must
    fall back to the XLA path."""
    from rl8_tpu.ops.fused_mlp import chains_fit_vmem

    assert chains_fit_vmem(_fake_chains(4, 256))
    assert chains_fit_vmem(_fake_chains(4, 1024))
    assert not chains_fit_vmem(_fake_chains(4, 4096))


def test_model_fits_vmem_default_and_custom() -> None:
    """The init-time gate sees real flax param trees for both default
    models and FusedApplySpec customs."""
    from rl8_tpu.data import DataKeys
    from rl8_tpu.models import DefaultDiscreteModel
    from rl8_tpu.ops.fused_mlp import model_fits_vmem
    from rl8_tpu.specs import Discrete, Unbounded

    obs = jnp.zeros((4, 3))
    small = DefaultDiscreteModel(Unbounded(3), Discrete(2, shape=(1,)))
    p = small.init(jax.random.key(0), {DataKeys.OBS: obs})["params"]
    assert model_fits_vmem(small, p)

    huge = DefaultDiscreteModel(
        Unbounded(3), Discrete(2, shape=(1,)), hiddens=(4096, 4096)
    )
    p = huge.init(jax.random.key(0), {DataKeys.OBS: obs})["params"]
    assert not model_fits_vmem(huge, p)

    mule = _mule()
    batch = _mule_batch()
    p = mule.init(jax.random.key(0), batch)["params"]
    assert model_fits_vmem(mule, p)


@pytest.mark.slow
def test_fused_chains_wide_torso_interpret() -> None:
    """A 512-wide LayerNorm chain (shrunken tile regime) still matches
    the XLA forward/backward in interpret mode."""
    from rl8_tpu.ops.fused_mlp import fused_chains

    k = jax.random.key(7)
    ks = jax.random.split(k, 6)
    d_in, w = 24, 512
    x = jax.random.normal(ks[0], (64, d_in), jnp.float32)
    chains = (
        (
            (
                (
                    jax.random.normal(ks[1], (d_in, w)) / 8,
                    jnp.zeros((w,)),
                    jnp.ones((w,)),
                    jnp.zeros((w,)),
                ),
            ),
            ((jax.random.normal(ks[2], (w, 3)) / 32, jnp.zeros((3,))),),
        ),
    )

    def ref(x, chains):
        ((layer,), ((hw, hb),)) = (chains[0][0], chains[0][1])
        wt, b, g, be = layer
        z = x @ wt + b
        mu = jnp.mean(z, axis=1, keepdims=True)
        var = jnp.mean(z * z, axis=1, keepdims=True) - mu * mu
        zn = (z - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
        h = jax.nn.relu(zn)
        return h @ hw + hb

    # The 512-wide contraction runs on the MXU in bf16 (f32 accumulate),
    # so compare at matmul precision, not f32-exactly.
    out_ref = ref(x, chains)
    ((out_fused,),) = fused_chains("relu", True, x, chains)
    _rel_close(out_ref, out_fused, 2e-2)

    g_ref = jax.grad(lambda c: jnp.sum(jnp.tanh(ref(x, c))))(chains)
    g_fused = jax.grad(
        lambda c: jnp.sum(jnp.tanh(fused_chains("relu", True, x, c)[0][0]))
    )(chains)
    jax.tree_util.tree_map(lambda a, b: _norm_close(a, b, 8e-2), g_ref, g_fused)


@pytest.mark.slow
def test_fused_custom_apply_matches_flax_alpaca() -> None:
    """`fused_custom_apply` on AttentiveAlpaca — embedding + attention +
    pooling re-applied in XLA, twin LayerNorm-MLP chains in the kernel —
    equals the flax apply to matmul precision, forward and gradients
    (including the attention stack's params through the kernel's dx)."""
    from examples.algotrading.models import AttentiveAlpaca
    from rl8_tpu.data import DataKeys
    from rl8_tpu.ops.fused_mlp import fused_custom_apply, supports_fused_apply
    from rl8_tpu.specs import Composite, Discrete, Unbounded

    obs_spec = Composite(
        {
            "action_mask": Discrete(2, shape=(3,), dtype=jnp.int32),
            "invested": Discrete(2, shape=(1,), dtype=jnp.int32),
            "LOG_CHANGE(price)": Unbounded(1),
            "LOG_CHANGE(price, position)": Unbounded(1),
        }
    )
    model = AttentiveAlpaca(
        obs_spec, Discrete(3, shape=(1,)), hiddens=(32, 32), num_layers=1
    )
    assert supports_fused_apply(model)
    batch = _mule_batch()
    params = model.init(jax.random.key(0), batch)["params"]

    f_ref, v_ref = model.apply({"params": params}, batch)
    f_fused, v_fused = fused_custom_apply(model, params, batch, interpret=True)
    valid = f_ref["logits"] > -1e37
    _rel_close(
        jnp.where(valid, f_ref["logits"], 0.0),
        jnp.where(valid, f_fused["logits"], 0.0),
        2e-2,
    )
    _rel_close(v_ref, v_fused, 2e-2)

    def loss(p, fused):
        if fused:
            f, v = fused_custom_apply(model, p, batch, interpret=True)
        else:
            f, v = model.apply({"params": p}, batch)
        lg = jnp.where(f["logits"] > -1e37, f["logits"], 0.0)
        return jnp.mean(jnp.sin(lg)) + jnp.mean(v * v)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_fused = jax.grad(lambda p: loss(p, True))(params)

    def close(a, b):
        # Floor the denominator: the attention key bias cancels in
        # softmax, so its true gradient is ~0 and a pure relative check
        # would divide by rounding noise.
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        err = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-6)
        assert err < 8e-2, f"relative norm error {err}"

    jax.tree_util.tree_map(close, g_ref, g_fused)


@pytest.mark.slow
def test_fused_recurrent_custom_apply_matches_flax_lemur() -> None:
    """`fused_recurrent_custom_apply` on LazyLemur — embedding + stacked
    LSTM re-applied in XLA, twin LayerNorm-MLP chains in the kernel —
    equals the flax apply to matmul precision: forward, new states
    (bit-exact: the RNN half is the same flax code), and gradients
    (including BPTT into the LSTM through the kernel's dx)."""
    from examples.algotrading.models import LazyLemur
    from rl8_tpu.data import DataKeys
    from rl8_tpu.ops.fused_mlp import (
        fused_recurrent_custom_apply,
        supports_fused_recurrent_apply,
    )
    from rl8_tpu.specs import Composite, Discrete, Unbounded

    obs_spec = Composite(
        {
            "action_mask": Discrete(2, shape=(3,), dtype=jnp.int32),
            "invested": Discrete(2, shape=(1,), dtype=jnp.int32),
            "LOG_CHANGE(price)": Unbounded(1),
            "LOG_CHANGE(price, position)": Unbounded(1),
        }
    )
    model = LazyLemur(obs_spec, Discrete(3, shape=(1,)), hiddens=(32, 32))
    assert supports_fused_recurrent_apply(model)
    B, T = 24, 4
    batch = {
        DataKeys.OBS: {
            "action_mask": jnp.ones((B, T, 3), jnp.int32).at[: B // 2, :, 1].set(0),
            "invested": jax.random.randint(jax.random.key(2), (B, T, 1), 0, 2),
            "LOG_CHANGE(price)": jax.random.normal(jax.random.key(3), (B, T, 1)),
            "LOG_CHANGE(price, position)": jax.random.normal(
                jax.random.key(4), (B, T, 1)
            ),
        }
    }
    states = model.init_states(B)
    params = model.init(jax.random.key(0), batch, states)["params"]

    (f_ref, v_ref), s_ref = model.apply({"params": params}, batch, states)
    (f_fused, v_fused), s_fused = fused_recurrent_custom_apply(
        model, params, batch, states, interpret=True
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s_ref,
        s_fused,
    )
    valid = f_ref["logits"] > -1e37
    _rel_close(
        jnp.where(valid, f_ref["logits"], 0.0),
        jnp.where(valid, f_fused["logits"], 0.0),
        2e-2,
    )
    _rel_close(v_ref, v_fused, 2e-2)

    def loss(p, fused):
        if fused:
            (f, v), _ = fused_recurrent_custom_apply(
                model, p, batch, states, interpret=True
            )
        else:
            (f, v), _ = model.apply({"params": p}, batch, states)
        lg = jnp.where(f["logits"] > -1e37, f["logits"], 0.0)
        return jnp.mean(jnp.sin(lg)) + jnp.mean(v * v)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_fused = jax.grad(lambda p: loss(p, True))(params)
    global_norm = float(
        jnp.sqrt(
            sum(jnp.sum(g.astype(jnp.float64) ** 2) for g in jax.tree_util.tree_leaves(g_ref))
        )
    )

    def close(a, b):
        # Floor the denominator at 2% of the global gradient norm: the
        # embedding table's gradient arrives through dx + BPTT and is
        # ~0.7% of the global norm, so bf16 rounding dominates a pure
        # leaf-relative comparison there.
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        err = np.linalg.norm(a - b) / max(np.linalg.norm(a), 0.02 * global_norm)
        assert err < 8e-2, f"relative norm error {err}"

    jax.tree_util.tree_map(close, g_ref, g_fused)


def test_supports_fused_recurrent_classification() -> None:
    """Recurrent specs gate separately from feedforward specs: a
    FusedRecurrentApplySpec model is not fused-apply capable on the
    feedforward path and vice versa."""
    from examples.algotrading.models import LazyLemur, MischievousMule
    from rl8_tpu.ops.fused_mlp import (
        supports_fused_apply,
        supports_fused_recurrent_apply,
    )
    from rl8_tpu.specs import Composite, Discrete, Unbounded

    obs_spec = Composite(
        {
            "action_mask": Discrete(2, shape=(3,), dtype=jnp.int32),
            "invested": Discrete(2, shape=(1,), dtype=jnp.int32),
            "LOG_CHANGE(price)": Unbounded(1),
            "LOG_CHANGE(price, position)": Unbounded(1),
        }
    )
    lemur = LazyLemur(obs_spec, Discrete(3, shape=(1,)))
    assert supports_fused_recurrent_apply(lemur)
    assert not supports_fused_apply(lemur)
    mule = MischievousMule(obs_spec, Discrete(3, shape=(1,)))
    assert supports_fused_apply(mule)
    assert not supports_fused_recurrent_apply(mule)
    assert not supports_fused_recurrent_apply(
        LazyLemur(obs_spec, Discrete(3, shape=(1,)), dtype=jnp.float16)
    )


@pytest.mark.slow
def test_fused_ppo_grads_wide_torso_interpret() -> None:
    """The fused update kernel still matches autodiff with a 1024-wide
    twin torso — the regime where the width-aware row tile shrinks
    (VERDICT r2 item 4). Small N keeps interpret-mode cost sane; the
    tile/grid logic is exercised by the same code paths as hardware."""
    from rl8_tpu.data import DataKeys
    from rl8_tpu.distributions import Categorical
    from rl8_tpu.models import DefaultDiscreteModel
    from rl8_tpu.nn import ppo_losses
    from rl8_tpu.ops import pack_rows
    from rl8_tpu.ops.fused_ppo import PPOLossConfig, fused_ppo_grads

    from rl8_tpu.specs import Discrete, Unbounded

    N = 24
    model = DefaultDiscreteModel(
        Unbounded(3), Discrete(4, shape=(1,)), hiddens=(1024, 1024)
    )
    actions = jax.random.randint(jax.random.key(7), (N, 1), 0, 4)
    obs = jax.random.normal(jax.random.key(3), (N, 3))
    params = model.init(jax.random.key(0), {DataKeys.OBS: obs})["params"]
    flat = {
        DataKeys.ACTIONS: actions,
        DataKeys.LOGP: 0.1 * jax.random.normal(jax.random.key(4), (N, 1)),
        DataKeys.ADVANTAGES: jax.random.normal(jax.random.key(5), (N, 1)),
        DataKeys.RETURNS: jax.random.normal(jax.random.key(6), (N, 1)),
        DataKeys.VIEWS: {DataKeys.OBS: obs},
    }
    packed, unpack = pack_rows(flat)
    cfg = PPOLossConfig(
        clip_param=0.2, vf_clip_param=1.5, vf_coeff=0.9,
        dual_clip_param=None, n_rows=N, accum=1, use_entropy=True,
        squashed=False,
    )

    def loss_fn(p):
        f, v = model.apply({"params": p}, {DataKeys.OBS: obs})
        dist = Categorical(f, model)
        losses = ppo_losses(
            flat, v, dist, clip_param=0.2, dual_clip_param=None,
            entropy_coeff=0.013, vf_clip_param=1.5, vf_coeff=0.9,
        )
        return losses["total"], losses

    (_, ref_losses), ref_grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    losses, _, grads = fused_ppo_grads(
        model, params, packed, unpack, 0.013, cfg, interpret=True
    )
    for k in ("policy", "vf", "total"):
        a, b = float(ref_losses[k]), float(losses[k])
        assert abs(a - b) < 2e-2 * (abs(a) + 1e-2), (k, a, b)
    jax.tree_util.tree_map(lambda a, b: _norm_close(a, b, 8e-2), ref_grads, grads)


@pytest.mark.slow
def test_fused_custom_apply_bf16_amp_path() -> None:
    """The AMP opt-in (custom spec model with dtype=bf16 — the tracked
    algotrading bench config) runs the fused kernels and stays within
    bf16 tolerance of the f32 flax reference; the kernels' fixed
    precision scheme (f32 accumulation/elementwise) may only tighten
    numerics relative to flax's bf16-everywhere forward."""
    from rl8_tpu.ops.fused_mlp import fused_custom_apply, supports_fused_apply

    model16 = _mule(dtype=jnp.bfloat16)
    model32 = _mule()
    assert supports_fused_apply(model16)
    batch = _mule_batch()
    # bf16 and f32 model params share structure; init in f32 for an
    # exact-reference forward.
    params = model32.init(jax.random.key(0), batch)["params"]

    f_ref, v_ref = model32.apply({"params": params}, batch)
    f_fused, v_fused = fused_custom_apply(model16, params, batch, interpret=True)
    valid = f_ref["logits"] > -1e37
    _rel_close(
        jnp.where(valid, f_ref["logits"], 0.0),
        jnp.where(valid, f_fused["logits"], 0.0),
        5e-2,
    )
    _rel_close(v_ref, v_fused, 5e-2)
    # Gradients trace and are finite through the bf16 path.
    def loss(p):
        f, v = fused_custom_apply(model16, p, batch, interpret=True)
        lg = jnp.where(f["logits"] > -1e37, f["logits"], 0.0)
        return jnp.mean(jnp.sin(lg)) + jnp.mean(v * v)

    g = jax.grad(loss)(params)
    assert all(
        bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util.tree_leaves(g)
    )


def test_supports_fused_rnn_update_weight_residency_gate() -> None:
    """Very wide LSTM cells (whose VMEM-resident weights + gradient
    accumulators exceed the kernel budget) fall back to autodiff; the
    supported sizes (default H=256, and H=1024 single layer) stay on
    the fused path."""
    from rl8_tpu.distributions import Categorical
    from rl8_tpu.models import DefaultDiscreteRecurrentModel
    from rl8_tpu.ops.fused_rnn_ppo import supports_fused_rnn_update
    from rl8_tpu.specs import Discrete, Unbounded

    def mk(H, L=1):
        return DefaultDiscreteRecurrentModel(
            Unbounded(3), Discrete(2, shape=(1,)), hidden_size=H, num_layers=L
        )

    assert supports_fused_rnn_update(mk(256), Categorical)
    assert supports_fused_rnn_update(mk(256, 2), Categorical)
    assert supports_fused_rnn_update(mk(1024), Categorical)
    assert not supports_fused_rnn_update(mk(2048), Categorical)
    assert not supports_fused_rnn_update(mk(1024, 4), Categorical)


def test_fused_act_widens_narrow_float_obs() -> None:
    """bf16/f16 observations are widened to f32 at the act-kernel
    boundary — the same convention as the update path's packed-row
    transport — instead of feeding narrow floats into Mosaic paths the
    toolchain doesn't support."""
    from jax.experimental.pallas import tpu as pltpu

    from rl8_tpu.data import DataKeys
    from rl8_tpu.distributions import Categorical
    from rl8_tpu.models import (
        DefaultDiscreteModel,
        DefaultDiscreteRecurrentModel,
    )
    from rl8_tpu.ops.fused_act import fused_act
    from rl8_tpu.ops.fused_rnn_act import fused_rnn_act
    from rl8_tpu.specs import Discrete, Unbounded

    obs32 = jax.random.normal(jax.random.key(1), (16, 3))
    obs16 = obs32.astype(jnp.bfloat16)

    model = DefaultDiscreteModel(
        Unbounded(3, dtype=jnp.bfloat16), Discrete(3, shape=(1,)),
        hiddens=(16,),
    )
    params = model.init(
        jax.random.key(0), {DataKeys.OBS: obs32[:, None]}
    )["params"]
    with pltpu.force_tpu_interpret_mode():
        a16, lp16, v16 = fused_act(
            model, params, {DataKeys.OBS: obs16}, jax.random.key(5),
            deterministic=True,
        )
        a32, lp32, v32 = fused_act(
            model, params, {DataKeys.OBS: obs16.astype(jnp.float32)},
            jax.random.key(5), deterministic=True,
        )
    np.testing.assert_array_equal(np.asarray(a16), np.asarray(a32))
    np.testing.assert_array_equal(np.asarray(v16), np.asarray(v32))

    rmodel = DefaultDiscreteRecurrentModel(
        Unbounded(3, dtype=jnp.bfloat16), Discrete(3, shape=(1,)),
        hidden_size=16,
    )
    states = {
        DataKeys.HIDDEN_STATES: jnp.zeros((16, 1, 16)),
        DataKeys.CELL_STATES: jnp.zeros((16, 1, 16)),
    }
    rparams = rmodel.init(
        jax.random.key(0), {DataKeys.OBS: obs32[:, None]}, states
    )["params"]
    with pltpu.force_tpu_interpret_mode():
        ra16, _, rv16, _ = fused_rnn_act(
            rmodel, rparams, obs16, states, jax.random.key(5),
            deterministic=True,
        )
        ra32, _, rv32, _ = fused_rnn_act(
            rmodel, rparams, obs16.astype(jnp.float32), states,
            jax.random.key(5), deterministic=True,
        )
    np.testing.assert_array_equal(np.asarray(ra16), np.asarray(ra32))
    np.testing.assert_array_equal(np.asarray(rv16), np.asarray(rv32))


def test_block_shuffle_blk1_is_exact_row_permutation() -> None:
    """blk=1 reproduces the reference's row-level uniform shuffle
    bit-for-bit (same key -> same permutation as jnp.take)."""
    from rl8_tpu.ops import block_shuffle

    key = jax.random.key(7)
    packed = jnp.arange(24 * 3, dtype=jnp.int32).reshape(24, 3)
    expected = jnp.take(packed, jax.random.permutation(key, 24), axis=0)
    np.testing.assert_array_equal(
        np.asarray(block_shuffle(packed, key, 1)), np.asarray(expected)
    )


def test_block_shuffle_preserves_blocks_and_rows() -> None:
    """Blocks of consecutive rows stay adjacent and in order; the row
    multiset is preserved; the block order actually changes."""
    from rl8_tpu.ops import block_shuffle

    n, d, blk = 32, 3, 4
    packed = jnp.arange(n * d, dtype=jnp.int32).reshape(n, d)
    out = np.asarray(block_shuffle(packed, jax.random.key(0), blk))
    assert sorted(map(tuple, out)) == sorted(map(tuple, np.asarray(packed)))
    # Each output block is an intact input block (first row identifies
    # it; the rest must follow in order).
    src = np.asarray(packed)
    starts = []
    for i in range(0, n, blk):
        start = out[i, 0] // d
        assert start % blk == 0
        np.testing.assert_array_equal(out[i : i + blk], src[start : start + blk])
        starts.append(start)
    assert starts != sorted(starts)  # actually shuffled


def test_shuffle_block_rows_hparam() -> None:
    """Validation and the minibatch-divisibility clamp."""
    import pytest

    from rl8_tpu.data import AlgorithmHparams

    common = dict(
        accumulate_grads=False, clip_param=0.2, dual_clip_param=None,
        enable_amp=False, gae_lambda=0.95, gamma=0.99, horizon=8,
        horizons_per_env_reset=1, max_grad_norm=5.0,
        normalize_advantages=True, normalize_rewards=True, num_envs=4,
        num_sgd_iters=2, sgd_minibatch_size=12, shuffle_minibatches=True,
        target_kl_div=None, vf_clip_param=5.0, vf_coeff=1.0,
    )
    h = AlgorithmHparams(shuffle_block_rows=8, **common)
    assert h.effective_shuffle_block == 4  # gcd(8, 12)
    assert AlgorithmHparams(shuffle_block_rows=1, **common).effective_shuffle_block == 1
    with pytest.raises(ValueError, match="shuffle_block_rows"):
        AlgorithmHparams(shuffle_block_rows=0, **common)
