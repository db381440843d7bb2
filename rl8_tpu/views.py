"""Views: batch preprocessing that creates overlapping time-series windows
prior to feeding samples into a policy's model.

JAX counterpart of ``/root/reference/src/rl8/views.py``. Where the
reference builds windows with ``Tensor.unfold`` strides
(``views.py:121-148``), this implementation uses a static gather index
map (``jnp.take`` along the time axis), which XLA lowers to cheap
static-shape gathers/reshapes and fuses with downstream compute. Batches
are pytrees (nested dicts of arrays) instead of TensorDicts; keys may be
strings or tuples of strings for nested access.

All output shapes are static functions of input shapes, so every view is
jit-compatible at any call site.
"""

from __future__ import annotations

from typing import Any, Literal, Protocol

import jax
import jax.numpy as jnp

from .data import DataKeys
from .utils import get_nested

__all__ = [
    "ViewKind",
    "ViewMethod",
    "View",
    "ViewRequirement",
    "RollingWindow",
    "PaddedRollingWindow",
    "rolling_window",
    "pad_last_sequence",
    "pad_whole_sequence",
]

ViewKind = Literal["last", "all"]
ViewMethod = Literal["rolling_window", "padded_rolling_window"]

Batch = Any  # pytree of arrays with leading [B, T, ...] dims


class View(Protocol):
    """A view method protocol (``/root/reference/src/rl8/views.py:14-52``)."""

    @staticmethod
    def apply_all(x: Batch, size: int, /) -> Batch:
        ...

    @staticmethod
    def apply_last(x: Batch, size: int, /) -> Batch:
        ...

    @staticmethod
    def drop_size(size: int, /) -> int:
        ...


def _tree_map(fn, x: Batch) -> Batch:
    # jax arrays are pytree leaves, so plain tree_map covers both the
    # bare-array and nested-mapping cases.
    return jax.tree_util.tree_map(fn, x)


def rolling_window(x: jax.Array, size: int, /, *, step: int = 1) -> jax.Array:
    """Map the time dimension of ``x [B, T, ...]`` into rolling windows,
    returning ``[B, (T - size) // step + 1, size, ...]``.

    Counterpart of the reference's unfold+permute
    (``/root/reference/src/rl8/views.py:121-148``), implemented as a
    static gather so it compiles to a fixed-shape ``jnp.take``.

    Examples:
        >>> import jax.numpy as jnp
        >>> from rl8_tpu.views import rolling_window
        >>> x = jnp.arange(5).reshape(1, 5)
        >>> rolling_window(x, 3).tolist()
        [[[0, 1, 2], [1, 2, 3], [2, 3, 4]]]

    """
    T = x.shape[1]
    if T < size:
        raise ValueError(
            f"Cannot build rolling windows of size {size} over a time"
            f" dimension of length {T} (the reference's `Tensor.unfold`"
            " raises here too). Use `padded_rolling_window`, or collect"
            " a longer horizon."
        )
    num_windows = (T - size) // step + 1
    starts = jnp.arange(num_windows) * step
    idx = starts[:, None] + jnp.arange(size)[None, :]  # [W, size]
    return jnp.take(x, idx, axis=1)  # [B, W, size, ...]


def pad_last_sequence(x: jax.Array, size: int, /) -> dict[str, jax.Array]:
    """Left-pad ``x [B, T, ...]`` so selecting the last ``size`` elements
    always yields a full window (``views.py:55-87``).

    Returns:
        ``{"inputs": [B, size, ...], "padding_mask": [B, size]}`` where
        ``True`` mask entries are padding.
    """
    B, T = x.shape[:2]
    pad = size - T
    if pad > 0:
        padding = jnp.zeros((B, pad, *x.shape[2:]), dtype=x.dtype)
        inputs = jnp.concatenate([padding, x], axis=1)
        mask = jnp.concatenate(
            [jnp.ones((B, pad), dtype=bool), jnp.zeros((B, T), dtype=bool)], axis=1
        )
    else:
        inputs = x[:, -size:, ...]
        mask = jnp.zeros((B, size), dtype=bool)
    return {DataKeys.INPUTS: inputs, DataKeys.PADDING_MASK: mask}


def pad_whole_sequence(x: jax.Array, size: int, /) -> dict[str, jax.Array]:
    """Left-pad ``x [B, T, ...]`` so a subsequent :func:`rolling_window`
    keeps all ``T`` positions (``views.py:90-118``).

    Returns:
        ``{"inputs": [B, T + size - 1, ...], "padding_mask": [B, T + size - 1]}``.
    """
    B, T = x.shape[:2]
    pad = RollingWindow.drop_size(size)
    padding = jnp.zeros((B, pad, *x.shape[2:]), dtype=x.dtype)
    inputs = jnp.concatenate([padding, x], axis=1)
    mask = jnp.concatenate(
        [jnp.ones((B, pad), dtype=bool), jnp.zeros((B, T), dtype=bool)], axis=1
    )
    return {DataKeys.INPUTS: inputs, DataKeys.PADDING_MASK: mask}


class RollingWindow:
    """A view creating rolling windows without masking, at the expense of
    dropping the first ``size - 1`` samples of each sequence
    (``/root/reference/src/rl8/views.py:151-229``).
    """

    @staticmethod
    def apply_all(x: Batch, size: int, /) -> Batch:
        """Window the time axis and fold windows into the batch axis:
        ``[B, T, ...] -> [B * (T - size + 1), size, ...]``."""

        def _one(t: jax.Array) -> jax.Array:
            w = rolling_window(t, size)
            return w.reshape(-1, size, *t.shape[2:])

        return _tree_map(_one, x)

    @staticmethod
    def apply_last(x: Batch, size: int, /) -> Batch:
        """Grab the last ``size`` elements along the time axis:
        ``[B, T, ...] -> [B, min(T, size), ...]``."""
        return _tree_map(lambda t: t[:, -size:, ...], x)

    @staticmethod
    def drop_size(size: int, /) -> int:
        return size - 1


class PaddedRollingWindow:
    """:class:`RollingWindow` with padding and masking applied beforehand
    so no samples are dropped (``/root/reference/src/rl8/views.py:232-309``).
    """

    @staticmethod
    def apply_all(x: Batch, size: int, /) -> Batch:
        """``[B, T, ...] -> {"inputs": [B*T, size, ...], "padding_mask": [B*T, size]}``
        (per leaf when ``x`` is a pytree)."""
        return _tree_map(
            lambda t: RollingWindow.apply_all(pad_whole_sequence(t, size), size), x
        )

    @staticmethod
    def apply_last(x: Batch, size: int, /) -> Batch:
        """``[B, T, ...] -> {"inputs": [B, size, ...], "padding_mask": [B, size]}``
        (per leaf when ``x`` is a pytree)."""
        return _tree_map(lambda t: pad_last_sequence(t, size), x)

    @staticmethod
    def drop_size(size: int, /) -> int:
        return 0




class ViewRequirement:
    """Batch preprocessing requirement applied to one batch key before the
    model forward pass (``/root/reference/src/rl8/views.py:312-453``).

    Args:
        shift: Number of *additional previous* samples along the time axis
            to include in the output (``shift=0`` passes through).
        method: ``"rolling_window"`` (drops early samples) or
            ``"padded_rolling_window"`` (pads + masks; default).

    Examples:
        >>> import jax.numpy as jnp
        >>> from rl8_tpu.views import ViewRequirement
        >>> batch = {"obs": jnp.arange(4.0).reshape(1, 4, 1)}
        >>> req = ViewRequirement(shift=1, method="rolling_window")
        >>> req.apply_last("obs", batch).tolist()  # last window only
        [[[2.0], [3.0]]]
        >>> req.apply_all("obs", batch).shape  # windows folded into batch
        (3, 2, 1)
        >>> req.drop_size
        1

    """

    method: type[View]
    shift: int

    def __init__(
        self, *, shift: int = 0, method: ViewMethod = "padded_rolling_window"
    ) -> None:
        if shift < 0:
            raise ValueError(f"{self.__class__.__name__} `shift` must be non-negative.")
        self.shift = shift
        match method:
            case "rolling_window":
                self.method = RollingWindow
            case "padded_rolling_window":
                self.method = PaddedRollingWindow
            case _:
                raise ValueError(f"No view method for {method}.")

    def apply_all(self, key: str | tuple[str, ...], batch: Batch, /) -> Batch:
        """Apply the view over all time elements, folding time into batch:
        used in the training path (``views.py:376-414``).

        With ``shift == 0`` this is a plain ``[B, T, ...] -> [B * T, ...]``
        flatten.
        """
        item = get_nested(batch, key)
        item = jax.lax.stop_gradient(item)
        if not self.shift:
            return _tree_map(lambda t: t.reshape(-1, *t.shape[2:]), item)
        return self.method.apply_all(item, self.shift + 1)

    def apply_last(self, key: str | tuple[str, ...], batch: Batch, /) -> Batch:
        """Apply the view to just the last time elements: used when
        sampling actions for parallel envs (``views.py:416-447``).

        With ``shift == 0`` this selects ``[:, -1]``.
        """
        item = get_nested(batch, key)
        item = jax.lax.stop_gradient(item)
        if not self.shift:
            return _tree_map(lambda t: t[:, -1, ...], item)
        return self.method.apply_last(item, self.shift + 1)

    @property
    def drop_size(self) -> int:
        """Samples dropped along time per batch element (``views.py:449-453``)."""
        return self.method.drop_size(self.shift + 1)
