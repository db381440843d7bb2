"""Minimal ``tensordict.TensorDict`` stand-in for running the reference
(`/root/reference`) on this machine, where the real `tensordict` wheel
is not installed.

Implements exactly the API surface the reference library and its
examples use (verified by grep + by running the reference's own test
suite under this shim): construction from (nested) mappings, string /
tuple-key access, batch-dim indexing and slicing with view semantics,
in-place indexed assignment, ``reshape``/``apply``/``select``/``keys``/
``items``, ``batch_size``/``shape``/``size``/``device``, and ``del``.

This is a clean-room shim written for parity benchmarking — not a copy
of the tensordict library. Performance is adequate for CPU curve
recording; no attempt is made to match tensordict's memory layout or
lazy features.
"""

from __future__ import annotations

from typing import Any, Iterator, Mapping

import torch

__all__ = ["TensorDict"]


def _normalize_batch_size(batch_size: Any) -> torch.Size:
    if batch_size is None:
        return torch.Size([])
    if isinstance(batch_size, int):
        return torch.Size([batch_size])
    return torch.Size(batch_size)


def _indexed_shape(batch_size: torch.Size, index: Any) -> torch.Size:
    """Shape of a ``batch_size`` tensor after ``[index]`` (cheap bool
    dummy; batch sizes here are at most ~num_envs * horizon)."""
    return torch.zeros(batch_size, dtype=torch.bool)[index].shape


class TensorDict:
    """A dict of tensors (and nested TensorDicts) sharing leading batch
    dimensions."""

    def __init__(
        self,
        source: None | Mapping[str, Any] = None,
        batch_size: Any = None,
        device: Any = None,
    ) -> None:
        self._data: dict[str, Any] = {}
        self.batch_size = _normalize_batch_size(batch_size)
        self.device = torch.device(device) if device is not None else None
        if source:
            for k, v in source.items():
                self[k] = v

    # -- core mapping / indexing ------------------------------------

    @staticmethod
    def _is_key(key: Any) -> bool:
        return isinstance(key, str) or (
            isinstance(key, tuple)
            and len(key) > 0
            and all(isinstance(k, str) for k in key)
        )

    def _wrap(self, value: Any) -> Any:
        if isinstance(value, TensorDict):
            return value
        if isinstance(value, Mapping):
            return TensorDict(value, batch_size=self.batch_size, device=self.device)
        if isinstance(value, torch.Tensor):
            return value
        return torch.as_tensor(value, device=self.device)

    def __getitem__(self, key: Any) -> Any:
        if isinstance(key, str):
            return self._data[key]
        if self._is_key(key):
            out: Any = self
            for k in key:
                out = out[k]
            return out
        # Batch-dim indexing: views into the same storage, so indexed
        # assignment through the result writes through (torch slicing
        # semantics; advanced indexing copies, as with plain tensors).
        new = TensorDict(
            batch_size=_indexed_shape(self.batch_size, key), device=self.device
        )
        for k, v in self._data.items():
            new._data[k] = v[key]
        return new

    def __setitem__(self, key: Any, value: Any) -> None:
        if isinstance(key, str):
            self._data[key] = self._wrap(value)
            return
        if self._is_key(key):
            target: Any = self
            for k in key[:-1]:
                target = target[k]
            target[key[-1]] = value
            return
        # Indexed in-place assignment.
        if isinstance(value, (TensorDict, Mapping)):
            for k in self._data:
                self._data[k][key] = value[k]
        else:
            for k in self._data:
                self._data[k][key] = value

    def __delitem__(self, key: str) -> None:
        del self._data[key]

    def __contains__(self, key: Any) -> bool:
        if isinstance(key, str):
            return key in self._data
        if self._is_key(key):
            target: Any = self
            for k in key:
                if not isinstance(target, TensorDict) or k not in target._data:
                    return False
                target = target._data[k]
            return True
        return False

    def keys(self):
        return self._data.keys()

    def values(self):
        return self._data.values()

    def items(self):
        return self._data.items()

    def get(self, key: Any, default: Any = None) -> Any:
        try:
            return self[key]
        except KeyError:
            return default

    def set(self, key: Any, value: Any) -> "TensorDict":
        self[key] = value
        return self

    def update(self, other: Mapping[str, Any]) -> "TensorDict":
        for k, v in other.items():
            self[k] = v
        return self

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    # -- shape operations --------------------------------------------

    @property
    def shape(self) -> torch.Size:
        return self.batch_size

    def size(self, dim: None | int = None) -> Any:
        return self.batch_size if dim is None else self.batch_size[dim]

    @property
    def ndim(self) -> int:
        return len(self.batch_size)

    def reshape(self, *shape: Any) -> "TensorDict":
        if len(shape) == 1 and isinstance(shape[0], (tuple, list, torch.Size)):
            shape = tuple(shape[0])
        if self.ndim == 0 and shape and -1 not in shape:
            # Reshaping a zero-batch-dim dict to an explicit batch shape
            # claims the leaves' LEADING dims as batch dims (the serving
            # path builds `TensorDict({...}, batch_size=[]).reshape(B, T)`
            # around already-[B, T, ...]-shaped leaves).
            new_batch = torch.Size(int(s) for s in shape)
            import math as _math

            new = TensorDict(batch_size=new_batch, device=self.device)
            for k, v in self._data.items():
                lead = v.shape[: len(new_batch)] if not isinstance(v, TensorDict) else v.batch_size[: len(new_batch)]
                if _math.prod(lead) != _math.prod(new_batch):
                    raise ValueError(
                        f"cannot claim leading dims {tuple(lead)} of {k!r}"
                        f" as batch shape {tuple(new_batch)}"
                    )
                if isinstance(v, TensorDict):
                    new._data[k] = v.reshape(*new_batch, *v.batch_size[len(new_batch):])
                else:
                    new._data[k] = v.reshape(*new_batch, *v.shape[len(new_batch):])
            return new
        new_batch = torch.zeros(self.batch_size, dtype=torch.bool).reshape(
            *shape
        ).shape
        new = TensorDict(batch_size=new_batch, device=self.device)
        n = self.ndim
        for k, v in self._data.items():
            if isinstance(v, TensorDict):
                # Nested dicts share the parent's batch dims; reshape
                # their own extra batch dims along for the ride.
                extra = v.batch_size[n:]
                new._data[k] = v.reshape(*new_batch, *extra)
            else:
                new._data[k] = v.reshape(*new_batch, *v.shape[n:])
        return new

    def apply(self, fn: Any, batch_size: Any = None) -> "TensorDict":
        new_batch = (
            _normalize_batch_size(batch_size)
            if batch_size is not None
            else self.batch_size
        )
        new = TensorDict(batch_size=new_batch, device=self.device)
        for k, v in self._data.items():
            if isinstance(v, TensorDict):
                new._data[k] = v.apply(fn, batch_size=batch_size)
            else:
                new._data[k] = fn(v)
        return new

    def select(self, *keys: Any, inplace: bool = False) -> "TensorDict":
        if inplace:
            keep = {k: self._data[k] for k in keys if isinstance(k, str)}
            self._data = keep
            return self
        new = TensorDict(batch_size=self.batch_size, device=self.device)
        for key in keys:
            new[key] = self[key]
        return new

    def exclude(self, *keys: Any) -> "TensorDict":
        new = TensorDict(batch_size=self.batch_size, device=self.device)
        for k, v in self._data.items():
            if k not in keys:
                new._data[k] = v
        return new

    def clone(self) -> "TensorDict":
        new = TensorDict(batch_size=self.batch_size, device=self.device)
        for k, v in self._data.items():
            new._data[k] = v.clone()
        return new

    def to(self, device: Any) -> "TensorDict":
        new = TensorDict(batch_size=self.batch_size, device=device)
        for k, v in self._data.items():
            new._data[k] = v.to(device)
        return new

    def detach(self) -> "TensorDict":
        return self.apply(lambda t: t.detach())

    def __eq__(self, other: Any) -> Any:  # type: ignore[override]
        new = TensorDict(batch_size=self.batch_size, device=self.device)
        for k, v in self._data.items():
            new._data[k] = v == (other[k] if isinstance(other, (TensorDict, Mapping)) else other)
        return new

    __hash__ = None  # type: ignore[assignment]

    def all(self) -> bool:
        return all(
            bool(v.all()) for v in self._data.values()
        )

    def any(self) -> bool:
        return any(bool(v.any()) for v in self._data.values())

    def __repr__(self) -> str:
        inner = ", ".join(
            f"{k}: {tuple(v.shape) if isinstance(v, torch.Tensor) else v!r}"
            for k, v in self._data.items()
        )
        return f"TensorDict(batch_size={tuple(self.batch_size)}, {{{inner}}})"
