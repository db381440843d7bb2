"""Native tensor-spec system for describing environment/model IO.

This replaces the reference's third-party ``torchrl.data`` specs
(``Unbounded``, ``Categorical``, ``Composite``; see
``/root/reference/src/rl8/env.py:8`` and usage at
``/root/reference/src/rl8/algorithms/_feedforward.py:239-256``) with a
small, JAX-native spec tree. Specs are *static metadata only* — frozen,
hashable dataclasses safe to embed in jitted closures and flax module
fields. All array-producing methods (``zero``, ``rand``, ``encode``)
return ``jnp`` arrays with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterator, Mapping

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Spec",
    "TensorSpec",
    "Unbounded",
    "Bounded",
    "Discrete",
    "Composite",
    "assert_1d_spec",
    "assert_nd_spec",
]


@dataclasses.dataclass(frozen=True)
class TensorSpec:
    """Base leaf spec: a shape, a dtype, and membership semantics."""

    shape: tuple[int, ...]
    dtype: Any

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def zero(self, batch_shape: tuple[int, ...] = ()) -> jax.Array:
        """Return a zero-filled array of shape ``[*batch_shape, *self.shape]``."""
        return jnp.zeros((*batch_shape, *self.shape), dtype=self.dtype)

    def rand(self, key: jax.Array, batch_shape: tuple[int, ...] = ()) -> jax.Array:
        raise NotImplementedError

    def contains(self, x: Any) -> bool:
        """Host-side membership check on shape/dtype kind (and bounds)."""
        x = np.asarray(x)
        if x.ndim < self.ndim or tuple(x.shape[x.ndim - self.ndim :]) != self.shape:
            return False
        return self._contains_values(x)

    def _contains_values(self, x: np.ndarray) -> bool:
        return True

    def assert_is_in(self, x: Any) -> None:
        if not self.contains(x):
            raise AssertionError(f"Value with shape {np.asarray(x).shape} is not in {self}.")

    def encode(self, x: Any) -> jax.Array:
        """Convert external data (NumPy/lists) into an array matching the spec."""
        return jnp.asarray(x, dtype=self.dtype)


def _normalize_shape(shape: int | tuple[int, ...] | list[int]) -> tuple[int, ...]:
    if isinstance(shape, int):
        return (shape,)
    return tuple(int(s) for s in shape)


class Unbounded(TensorSpec):
    """Continuous, unbounded spec (analog of ``torchrl.data.Unbounded``)."""

    def __init__(self, shape: int | tuple[int, ...] = (), dtype: Any = jnp.float32) -> None:
        super().__init__(shape=_normalize_shape(shape), dtype=dtype)

    def rand(self, key: jax.Array, batch_shape: tuple[int, ...] = ()) -> jax.Array:
        shape = (*batch_shape, *self.shape)
        # Unbounded specs may carry non-float dtypes (e.g. integer
        # observation features); `normal` rejects those, so sample the
        # dtype's own support instead of crashing deep inside rand.
        if jnp.issubdtype(self.dtype, jnp.bool_):
            return jax.random.bernoulli(key, shape=shape)
        if not jnp.issubdtype(self.dtype, jnp.inexact):
            info = jnp.iinfo(self.dtype)
            return jax.random.randint(
                key, shape, info.min, info.max, dtype=self.dtype
            )
        return jax.random.normal(key, shape, dtype=self.dtype)


@dataclasses.dataclass(frozen=True)
class Bounded(TensorSpec):
    """Continuous spec with elementwise bounds."""

    low: float = -1.0
    high: float = 1.0

    def __init__(
        self,
        shape: int | tuple[int, ...] = (),
        *,
        low: float = -1.0,
        high: float = 1.0,
        dtype: Any = jnp.float32,
    ) -> None:
        object.__setattr__(self, "shape", _normalize_shape(shape))
        object.__setattr__(self, "dtype", dtype)
        object.__setattr__(self, "low", float(low))
        object.__setattr__(self, "high", float(high))

    def rand(self, key: jax.Array, batch_shape: tuple[int, ...] = ()) -> jax.Array:
        return jax.random.uniform(
            key, (*batch_shape, *self.shape), dtype=self.dtype, minval=self.low, maxval=self.high
        )

    def _contains_values(self, x: np.ndarray) -> bool:
        return bool(np.all(x >= self.low) and np.all(x <= self.high))


@dataclasses.dataclass(frozen=True)
class Discrete(TensorSpec):
    """Categorical/discrete spec with ``n`` categories per element
    (analog of ``torchrl.data.Categorical``).

    Examples:
        >>> from rl8_tpu.specs import Discrete
        >>> spec = Discrete(3, shape=(1,))
        >>> spec.zero((2,)).tolist()
        [[0], [0]]
        >>> spec.contains([[2]]), spec.contains([[3]])
        (True, False)

    """

    n: int = 2

    def __init__(
        self, n: int, shape: int | tuple[int, ...] = (1,), *, dtype: Any = jnp.int32
    ) -> None:
        object.__setattr__(self, "shape", _normalize_shape(shape))
        object.__setattr__(self, "dtype", dtype)
        object.__setattr__(self, "n", int(n))

    def rand(self, key: jax.Array, batch_shape: tuple[int, ...] = ()) -> jax.Array:
        return jax.random.randint(
            key, (*batch_shape, *self.shape), minval=0, maxval=self.n, dtype=self.dtype
        )

    def _contains_values(self, x: np.ndarray) -> bool:
        # Discrete membership requires integral values: a fractional
        # "action" passing a bounds-only check would silently truncate
        # in `encode`.
        if not (
            np.issubdtype(x.dtype, np.integer) or x.dtype == np.bool_
        ):
            return False
        return bool(np.all(x >= 0) and np.all(x < self.n))


class Composite(Mapping[str, "Spec"]):
    """A dict-of-specs pytree node (analog of ``torchrl.data.Composite``).

    ``zero``/``rand`` return plain dicts of arrays so buffers are ordinary
    JAX pytrees.
    """

    def __init__(self, specs: Mapping[str, "Spec"] | None = None, **kwargs: "Spec") -> None:
        items = dict(specs or {})
        items.update(kwargs)
        self._specs: dict[str, Spec] = items

    def __getitem__(self, key: str) -> "Spec":
        return self._specs[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._specs)

    def __len__(self) -> int:
        return len(self._specs)

    def __hash__(self) -> int:
        return hash(tuple(sorted((k, v) for k, v in self._specs.items())))

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Composite) and self._specs == other._specs

    def __repr__(self) -> str:
        return f"Composite({self._specs!r})"

    def set(self, key: str, spec: "Spec") -> "Composite":
        """Return a new composite with ``key`` set to ``spec``."""
        items = dict(self._specs)
        items[key] = spec
        return Composite(items)

    def zero(self, batch_shape: tuple[int, ...] = ()) -> dict[str, Any]:
        return {k: v.zero(batch_shape) for k, v in self._specs.items()}

    def rand(self, key: jax.Array, batch_shape: tuple[int, ...] = ()) -> dict[str, Any]:
        keys = jax.random.split(key, max(len(self._specs), 1))
        return {k: v.rand(sk, batch_shape) for sk, (k, v) in zip(keys, self._specs.items())}

    def contains(self, x: Any) -> bool:
        if not isinstance(x, Mapping):
            return False
        return all(k in x and v.contains(x[k]) for k, v in self._specs.items())

    def assert_is_in(self, x: Any) -> None:
        if not self.contains(x):
            raise AssertionError(f"Value is not in {self}.")

    def encode(self, x: Mapping[str, Any]) -> dict[str, Any]:
        return {k: v.encode(x[k]) for k, v in self._specs.items()}

    @property
    def ndim(self) -> int:
        return min(v.ndim for v in self._specs.values()) if self._specs else 0


Spec = TensorSpec | Composite


def assert_1d_spec(spec: Spec, /) -> None:
    """Check the spec is 1D, as required by default models/distributions.

    Mirrors ``/root/reference/src/rl8/_utils.py:17-35``.
    """
    # Explicit raise (not a bare `assert`): validation must survive
    # `python -O`.
    if not (isinstance(spec, TensorSpec) and spec.ndim == 1):
        raise AssertionError(
            f"{spec} is not compatible with default models and"
            " distributions. Tensor specs must have shape ``[N]`` to be"
            " compatible with default models and distributions."
        )


def assert_nd_spec(spec: Spec, /) -> None:
    """Check the spec is at least 1D (recursing through composites).

    Mirrors ``/root/reference/src/rl8/_utils.py:38-59``.
    """
    if isinstance(spec, Composite):
        for k in spec:
            assert_nd_spec(spec[k])
    elif spec.ndim < 1:  # explicit raise: must survive `python -O`
        raise AssertionError(
            f"{spec} is not a valid spec. Specs must have a non-empty shape "
            "``[N, ...]`` to interface with models and distributions."
        )
