"""Minimal ``torchrl.data`` spec stand-ins for running the reference.

Implements the spec surface the reference uses: ``Unbounded``,
``Categorical``, ``Composite``, and the ``TensorSpec`` base — with
``shape``/``ndim``/``dtype``/``device``, ``zero``/``rand``/``encode``/
``assert_is_in``/``to``, ``Categorical.space.n``, and Composite's
mapping behavior + ``set``. Clean-room shim; not a copy of torchrl.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Any, Iterator, Mapping

import torch

from tensordict import TensorDict

__all__ = ["TensorSpec", "Unbounded", "Categorical", "Composite"]


def _normalize_shape(shape: Any) -> torch.Size:
    if shape is None:
        return torch.Size([])
    if isinstance(shape, int):
        return torch.Size([shape])
    return torch.Size(shape)


class TensorSpec:
    """Base spec: shape, dtype, device, and membership semantics."""

    shape: torch.Size
    dtype: torch.dtype
    device: torch.device

    def __init__(
        self,
        shape: Any = None,
        *,
        device: Any = "cpu",
        dtype: torch.dtype = torch.float32,
    ) -> None:
        self.shape = _normalize_shape(shape)
        self.device = torch.device(device)
        self.dtype = dtype

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def zero(self, shape: Any = None, /) -> torch.Tensor:
        batch = _normalize_shape(shape)
        return torch.zeros(
            (*batch, *self.shape), dtype=self.dtype, device=self.device
        )

    def rand(self, shape: Any = None, /) -> torch.Tensor:
        raise NotImplementedError

    def encode(self, val: Any, /) -> torch.Tensor:
        return torch.as_tensor(val, dtype=self.dtype, device=self.device)

    def is_in(self, val: Any, /) -> bool:
        t = torch.as_tensor(val)
        n = self.ndim
        if n and (t.ndim < n or t.shape[t.ndim - n :] != self.shape):
            return False
        return self._values_in(t)

    def _values_in(self, t: torch.Tensor) -> bool:
        return True

    def assert_is_in(self, val: Any, /) -> None:
        assert self.is_in(val), (
            f"Value with shape {tuple(torch.as_tensor(val).shape)} is not"
            f" in {self!r}."
        )

    def to(self, device: Any, /) -> "TensorSpec":
        self.device = torch.device(device)
        return self

    def __repr__(self) -> str:
        return (
            f"{type(self).__name__}(shape={tuple(self.shape)},"
            f" dtype={self.dtype})"
        )


class Unbounded(TensorSpec):
    """Continuous unbounded spec."""

    def rand(self, shape: Any = None, /) -> torch.Tensor:
        batch = _normalize_shape(shape)
        if not self.dtype.is_floating_point:
            info = torch.iinfo(self.dtype)
            return torch.randint(
                info.min,
                info.max,
                (*batch, *self.shape),
                dtype=self.dtype,
                device=self.device,
            )
        return torch.randn(
            (*batch, *self.shape), dtype=self.dtype, device=self.device
        )


class Categorical(TensorSpec):
    """Discrete spec with ``n`` categories per element."""

    def __init__(
        self,
        n: int,
        shape: Any = None,
        *,
        device: Any = "cpu",
        dtype: torch.dtype = torch.int64,
    ) -> None:
        super().__init__(shape, device=device, dtype=dtype)
        self.space = SimpleNamespace(n=int(n))

    def rand(self, shape: Any = None, /) -> torch.Tensor:
        batch = _normalize_shape(shape)
        out = torch.randint(
            0, self.space.n, (*batch, *self.shape), device=self.device
        )
        return out.to(self.dtype)

    def _values_in(self, t: torch.Tensor) -> bool:
        if t.dtype.is_floating_point:
            return False
        return bool((t.long() >= 0).all() and (t.long() < self.space.n).all())

    def __repr__(self) -> str:
        return (
            f"Categorical(n={self.space.n}, shape={tuple(self.shape)},"
            f" dtype={self.dtype})"
        )


class Composite(Mapping[str, Any]):
    """A mapping of named specs."""

    def __init__(
        self, source: None | Mapping[str, Any] = None, *, device: Any = "cpu", **kwargs: Any
    ) -> None:
        self._specs: dict[str, Any] = dict(source or {})
        self._specs.update(kwargs)
        self.device = torch.device(device)

    def __getitem__(self, key: str) -> Any:
        return self._specs[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._specs)

    def __len__(self) -> int:
        return len(self._specs)

    def set(self, key: str, spec: Any) -> "Composite":
        self._specs[key] = spec
        return self

    @property
    def shape(self) -> torch.Size:
        return torch.Size([])

    @property
    def ndim(self) -> int:
        return 0

    def zero(self, shape: Any = None, /) -> TensorDict:
        batch = _normalize_shape(shape)
        return TensorDict(
            {k: s.zero(batch) for k, s in self._specs.items()},
            batch_size=batch,
            device=self.device,
        )

    def rand(self, shape: Any = None, /) -> TensorDict:
        batch = _normalize_shape(shape)
        return TensorDict(
            {k: s.rand(batch) for k, s in self._specs.items()},
            batch_size=batch,
            device=self.device,
        )

    def encode(self, val: Mapping[str, Any], /) -> dict[str, Any]:
        return {k: self._specs[k].encode(v) for k, v in val.items()}

    def is_in(self, val: Any, /) -> bool:
        return all(self._specs[k].is_in(val[k]) for k in self._specs)

    def assert_is_in(self, val: Any, /) -> None:
        for k in self._specs:
            self._specs[k].assert_is_in(val[k])

    def to(self, device: Any, /) -> "Composite":
        self.device = torch.device(device)
        for s in self._specs.values():
            s.to(device)
        return self

    def __repr__(self) -> str:
        return f"Composite({self._specs!r})"
