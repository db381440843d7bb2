import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl8_tpu.distributions import Categorical, Distribution, Normal, SquashedNormal
from rl8_tpu.specs import Discrete, Unbounded


def test_default_dist_cls_dispatch() -> None:
    assert Distribution.default_dist_cls(Discrete(2, shape=(1,))) is Categorical
    assert Distribution.default_dist_cls(Unbounded(1)) is Normal
    with pytest.raises(AssertionError):
        Distribution.default_dist_cls(Unbounded((2, 2)))


def test_categorical_shapes_and_logp() -> None:
    logits = jnp.zeros((5, 1, 3))
    dist = Categorical({"logits": logits})
    s = dist.sample(jax.random.key(0))
    assert s.shape == (5, 1)
    assert s.dtype == jnp.int32
    logp = dist.logp(s)
    assert logp.shape == (5, 1)
    np.testing.assert_allclose(logp, np.log(1 / 3) * np.ones((5, 1)), rtol=1e-4)
    ent = dist.entropy()
    np.testing.assert_allclose(ent, np.log(3) * np.ones((5, 1)), rtol=1e-4)
    d = dist.deterministic_sample()
    assert d.shape == (5, 1)


def test_categorical_deterministic_is_argmax() -> None:
    logits = jnp.array([[[0.0, 5.0, -1.0]]])
    dist = Categorical({"logits": logits})
    assert int(dist.deterministic_sample()[0, 0]) == 1


def test_categorical_logp_matches_gather_and_survives_inf_masks() -> None:
    """The one-hot logp select (a dense VPU op; TPU row gathers execute
    serially) must agree with an explicit take_along_axis gather, sum
    over multiple action components, and stay finite when OTHER
    components' logits are -inf-masked (0 * -inf would NaN under a
    multiply-based select)."""
    key = jax.random.key(3)
    logits = jax.random.normal(key, (16, 2, 5))
    # Mask a few (row, component, category) entries with true -inf.
    logits = logits.at[::3, 0, 4].set(-jnp.inf)
    dist = Categorical({"logits": logits})
    samples = jax.random.randint(jax.random.key(4), (16, 2), 0, 4)
    got = dist.logp(samples)
    ref_all = jax.nn.log_softmax(logits, axis=-1)
    ref = jnp.take_along_axis(ref_all, samples[..., None], axis=-1)[..., 0]
    ref = jnp.sum(ref, axis=-1, keepdims=True)
    assert got.shape == (16, 1)
    assert bool(jnp.all(jnp.isfinite(got)))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_normal_logp_entropy() -> None:
    mean = jnp.zeros((4, 2))
    log_std = jnp.zeros((4, 2))
    dist = Normal({"mean": mean, "log_std": log_std})
    x = jnp.zeros((4, 2))
    logp = dist.logp(x)
    # Standard normal at 0: logp per component = -0.5 log(2 pi); 2 components.
    np.testing.assert_allclose(
        logp, -np.log(2 * np.pi) * np.ones((4, 1)), rtol=1e-4
    )
    ent = dist.entropy()
    np.testing.assert_allclose(
        ent, (1 + np.log(2 * np.pi)) * np.ones((4, 1)), rtol=1e-4
    )
    assert dist.deterministic_sample().shape == (4, 2)
    assert dist.sample(jax.random.key(0)).shape == (4, 2)


def test_squashed_normal_bounds_and_logp() -> None:
    mean = jnp.full((8, 1), 3.0)
    log_std = jnp.zeros((8, 1))
    dist = SquashedNormal({"mean": mean, "log_std": log_std})
    s = dist.sample(jax.random.key(0))
    assert bool(jnp.all(jnp.abs(s) <= 1.0))
    d = dist.deterministic_sample()
    np.testing.assert_allclose(d, np.tanh(3.0) * np.ones((8, 1)), rtol=1e-4)
    logp = dist.logp(s)
    assert logp.shape == (8, 1)
    assert bool(jnp.all(jnp.isfinite(logp)))
    # Finite even exactly at the boundary.
    assert bool(jnp.all(jnp.isfinite(dist.logp(jnp.ones((8, 1))))))
    with pytest.raises(NotImplementedError):
        dist.entropy()


def test_sampling_statistics() -> None:
    mean = jnp.array([[1.0]])
    log_std = jnp.array([[-1.0]])
    dist = Normal({"mean": jnp.tile(mean, (10000, 1)), "log_std": jnp.tile(log_std, (10000, 1))})
    s = dist.sample(jax.random.key(0))
    assert abs(float(jnp.mean(s)) - 1.0) < 0.02
    assert abs(float(jnp.std(s)) - np.exp(-1.0)) < 0.02


def test_squashed_normal_logp_finite_just_outside_support() -> None:
    """Samples a hair outside [-1, 1] (bf16 round trips, replayed data)
    must clip into support rather than producing NaN log-probs."""
    import numpy as np

    from rl8_tpu.distributions import SquashedNormal

    features = {
        "mean": jnp.zeros((3, 2)),
        "log_std": jnp.zeros((3, 2)),
    }
    dist = SquashedNormal(features, None)
    samples = jnp.array(
        [[1.0 + 1e-7, -1.0 - 1e-7], [1.0, -1.0], [0.5, -0.5]]
    )
    logp = dist.logp(samples)
    assert bool(jnp.all(jnp.isfinite(logp))), np.asarray(logp)
