"""On-TPU equivalence tests for the fused Pallas kernels.

The CPU suite pins fused-vs-autodiff equivalence in interpret mode
(``tests/test_ops.py``); these run the REAL Mosaic-compiled kernels on
hardware and compare a full training step against the XLA autodiff path
under identical rollouts (fused acting disabled so both paths share the
threefry RNG stream). Run with::

    RL8_TPU_TESTS_ON_TPU=1 python -m pytest tests -m tpu
"""

import math

import jax
import pytest

pytestmark = pytest.mark.tpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


requires_tpu = pytest.mark.skipif(
    not _on_tpu(), reason="requires real TPU hardware (Mosaic kernels)"
)

_KEYS = (
    "losses/total",
    "losses/policy",
    "losses/vf",
    "monitors/kl_div",
)


def _first_step(fused: bool, kind: str, num_sgd_iters: int):
    from rl8_tpu import AlgorithmConfig, RecurrentAlgorithmConfig
    from rl8_tpu.distributions import SquashedNormal
    from rl8_tpu.env import ContinuousDummyEnv, DiscreteDummyEnv

    kwargs = dict(
        num_envs=256,
        horizon=8,
        seed=13,
        # SquashedNormal has no entropy; its fused support requires the
        # statically-zero entropy coefficient.
        entropy_coeff=0.0 if kind == "squashed" else 0.01,
        num_sgd_iters=num_sgd_iters,
        fused_update=fused,
        fused_act=False,  # identical threefry rollouts on both paths
    )
    if kind == "recurrent":
        algo = RecurrentAlgorithmConfig(
            **kwargs,
            seq_len=4,
            seqs_per_state_reset=2,
            model_config={"hidden_size": 32},
        ).build(DiscreteDummyEnv)
    elif kind in ("continuous", "squashed"):
        algo = AlgorithmConfig(
            **kwargs,
            model_config={"hiddens": (32, 32)},
            **(
                {"distribution_cls": SquashedNormal}
                if kind == "squashed"
                else {}
            ),
        ).build(ContinuousDummyEnv)
    else:
        algo = AlgorithmConfig(
            **kwargs, model_config={"hiddens": (32, 32)}
        ).build(DiscreteDummyEnv)
    algo.collect()
    return algo.step()


@requires_tpu
@pytest.mark.parametrize(
    "kind", ["discrete", "recurrent", "continuous", "squashed"]
)
def test_fused_update_matches_autodiff_on_hardware(kind: str) -> None:
    """The Mosaic-compiled fused update kernel matches the XLA autodiff
    path on identical rollouts, for every supported model/distribution
    pair (discrete Categorical, recurrent, continuous Normal, and
    SquashedNormal with static-zero entropy).

    With one SGD epoch (whole-buffer minibatch) the recorded losses come
    from identical parameters, so they must agree to bf16-matmul
    rounding. Over 4 epochs the per-update rounding differences compound
    through the optimizer, so only statistical-level agreement is
    expected there.
    """
    fused1 = _first_step(True, kind, 1)
    unfused1 = _first_step(False, kind, 1)
    for key in _KEYS:
        assert math.isclose(
            fused1[key], unfused1[key], rel_tol=5e-3, abs_tol=5e-4
        ), (key, fused1[key], unfused1[key])

    fused4 = _first_step(True, kind, 4)
    unfused4 = _first_step(False, kind, 4)
    for key in _KEYS:
        assert math.isclose(
            fused4[key], unfused4[key], rel_tol=5e-2, abs_tol=5e-3
        ), (key, fused4[key], unfused4[key])


@requires_tpu
@pytest.mark.parametrize("model_name", ["mule", "alpaca"])
def test_fused_custom_apply_matches_flax_on_hardware(model_name: str) -> None:
    """The Mosaic-compiled fused chain kernels behind a custom
    ``FusedApplySpec`` model (algotrading models: composite-obs assembly
    in XLA, LayerNorm-MLP chains in the kernel) match the flax apply on
    hardware — forward and parameter gradients — to bf16-matmul
    rounding. (A full-training-step comparison would diverge at
    categorical sampling decision boundaries, since ``fused_forward``
    changes the collect-time logits by rounding; the apply-level
    comparison isolates the kernel.)"""
    import numpy as np
    import jax.numpy as jnp

    from examples.algotrading.models import AttentiveAlpaca, MischievousMule
    from rl8_tpu.data import DataKeys
    from rl8_tpu.ops.fused_mlp import fused_custom_apply
    from rl8_tpu.specs import Composite, Discrete, Unbounded

    obs_spec = Composite(
        {
            "action_mask": Discrete(2, shape=(3,), dtype=jnp.int32),
            "invested": Discrete(2, shape=(1,), dtype=jnp.int32),
            "LOG_CHANGE(price)": Unbounded(1),
            "LOG_CHANGE(price, position)": Unbounded(1),
        }
    )
    act_spec = Discrete(3, shape=(1,))
    if model_name == "mule":
        model = MischievousMule(obs_spec, act_spec)
    else:
        model = AttentiveAlpaca(obs_spec, act_spec, num_layers=1)
    B, L = 512, model.seq_len
    batch = {
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
    params = model.init(jax.random.key(0), batch)["params"]

    def loss(p, fused):
        if fused:
            f, v = fused_custom_apply(model, p, batch)
        else:
            f, v = model.apply({"params": p}, batch)
        lg = jnp.where(f["logits"] > -1e37, f["logits"], 0.0)
        return jnp.mean(jnp.sin(lg)) + jnp.mean(v * v)

    l_ref, g_ref = jax.jit(jax.value_and_grad(lambda p: loss(p, False)))(params)
    l_fused, g_fused = jax.jit(jax.value_and_grad(lambda p: loss(p, True)))(params)
    assert math.isclose(float(l_ref), float(l_fused), rel_tol=5e-3, abs_tol=5e-4)

    def close(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        err = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-6)
        assert err < 5e-2, f"relative norm error {err}"

    jax.tree_util.tree_map(close, g_ref, g_fused)


@requires_tpu
def test_fused_recurrent_custom_apply_matches_flax_on_hardware() -> None:
    """The Mosaic-compiled fused chain kernels behind LazyLemur's
    ``FusedRecurrentApplySpec`` (embedding + stacked LSTM in XLA,
    post-LSTM LayerNorm-MLP chains in the kernel) match the flax apply
    on hardware — forward, new states (bit-exact), and gradients."""
    import numpy as np
    import jax.numpy as jnp

    from examples.algotrading.models import LazyLemur
    from rl8_tpu.data import DataKeys
    from rl8_tpu.ops.fused_mlp import fused_recurrent_custom_apply
    from rl8_tpu.specs import Composite, Discrete, Unbounded

    obs_spec = Composite(
        {
            "action_mask": Discrete(2, shape=(3,), dtype=jnp.int32),
            "invested": Discrete(2, shape=(1,), dtype=jnp.int32),
            "LOG_CHANGE(price)": Unbounded(1),
            "LOG_CHANGE(price, position)": Unbounded(1),
        }
    )
    model = LazyLemur(obs_spec, Discrete(3, shape=(1,)))
    B, T = 256, 4
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

    (_, _), s_ref = model.apply({"params": params}, batch, states)
    (_, _), s_fused = jax.jit(
        lambda p: fused_recurrent_custom_apply(model, p, batch, states)
    )(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        s_ref,
        s_fused,
    )

    def loss(p, fused):
        if fused:
            (f, v), _ = fused_recurrent_custom_apply(model, p, batch, states)
        else:
            (f, v), _ = model.apply({"params": p}, batch, states)
        lg = jnp.where(f["logits"] > -1e37, f["logits"], 0.0)
        return jnp.mean(jnp.sin(lg)) + jnp.mean(v * v)

    l_ref, g_ref = jax.jit(jax.value_and_grad(lambda p: loss(p, False)))(params)
    l_fused, g_fused = jax.jit(jax.value_and_grad(lambda p: loss(p, True)))(params)
    assert math.isclose(float(l_ref), float(l_fused), rel_tol=5e-3, abs_tol=5e-4)
    global_norm = float(
        jnp.sqrt(
            sum(jnp.sum(g ** 2) for g in jax.tree_util.tree_leaves(g_ref))
        )
    )

    def close(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        err = np.linalg.norm(a - b) / max(np.linalg.norm(a), 0.02 * global_norm)
        assert err < 5e-2, f"relative norm error {err}"

    jax.tree_util.tree_map(close, g_ref, g_fused)
