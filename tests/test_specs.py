import jax
import jax.numpy as jnp
import pytest

from rl8_tpu.specs import (
    Bounded,
    Composite,
    Discrete,
    Unbounded,
    assert_1d_spec,
    assert_nd_spec,
)


def test_unbounded_zero_and_rand() -> None:
    spec = Unbounded(3)
    z = spec.zero((4,))
    assert z.shape == (4, 3)
    assert z.dtype == jnp.float32
    r = spec.rand(jax.random.key(0), (4,))
    assert r.shape == (4, 3)
    assert spec.contains(r)


def test_discrete_membership() -> None:
    spec = Discrete(3, shape=(1,))
    assert spec.contains(jnp.array([[0], [2]]))
    assert not spec.contains(jnp.array([[3]]))
    r = spec.rand(jax.random.key(0), (16,))
    assert r.shape == (16, 1)
    assert spec.contains(r)
    with pytest.raises(AssertionError):
        spec.assert_is_in(jnp.array([[5]]))


def test_bounded_membership() -> None:
    spec = Bounded(2, low=-1.0, high=1.0)
    r = spec.rand(jax.random.key(0), (8,))
    assert spec.contains(r)
    assert not spec.contains(jnp.full((8, 2), 2.0))


def test_composite_zero_rand_contains() -> None:
    spec = Composite({"a": Unbounded(2), "b": Discrete(4, shape=(1,))})
    z = spec.zero((3,))
    assert set(z.keys()) == {"a", "b"}
    assert z["a"].shape == (3, 2)
    r = spec.rand(jax.random.key(0), (3,))
    assert spec.contains(r)
    spec2 = spec.set("c", Unbounded(1))
    assert "c" in spec2 and "c" not in spec


def test_spec_hashable_and_eq() -> None:
    assert Unbounded(3) == Unbounded(3)
    assert Unbounded(3) != Unbounded(4)
    assert Discrete(2, shape=(1,)) == Discrete(2, shape=(1,))
    assert hash(Discrete(2, shape=(1,))) == hash(Discrete(2, shape=(1,)))
    assert {Unbounded(3): 1}[Unbounded(3)] == 1


def test_assert_1d_and_nd() -> None:
    assert_1d_spec(Unbounded(3))
    with pytest.raises(AssertionError):
        assert_1d_spec(Unbounded((2, 2)))
    assert_nd_spec(Composite({"a": Unbounded(2)}))
    with pytest.raises(AssertionError):
        assert_nd_spec(Unbounded(()))


def test_encode() -> None:
    spec = Unbounded(2)
    x = spec.encode([[1.0, 2.0]])
    assert x.dtype == jnp.float32
    comp = Composite({"a": Unbounded(1)})
    out = comp.encode({"a": [[3.0]]})
    assert out["a"].shape == (1, 1)


def test_unbounded_rand_non_float_dtypes() -> None:
    """Unbounded specs with integer/bool dtypes sample their own support
    instead of crashing in jax.random.normal."""
    import jax
    import jax.numpy as jnp

    from rl8_tpu.specs import Unbounded

    ints = Unbounded(3, dtype=jnp.int32).rand(jax.random.key(0), (4,))
    assert ints.shape == (4, 3) and ints.dtype == jnp.int32
    bools = Unbounded(2, dtype=jnp.bool_).rand(jax.random.key(1))
    assert bools.shape == (2,) and bools.dtype == jnp.bool_
    floats = Unbounded(2).rand(jax.random.key(2))
    assert floats.dtype == jnp.float32
