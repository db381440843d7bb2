"""Host-side utilities: profiling, stat reduction, memory stats.

Counterpart of ``/root/reference/src/rl8/_utils.py``. The reference's
``Batcher``/``StatTracker`` hot-loop utilities (``_utils.py:175-313``)
have no host-side analog here — minibatching and loss stat tracking are
compiled into the jitted train step (see
``rl8_tpu/algorithms/_feedforward.py``) — so only the host-facing pieces
remain.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Any, Callable, Generator

__all__ = [
    "profile_ms",
    "reduce_stats",
    "memory_stats",
    "get_nested",
    "set_nested",
    "CumulativeAverage",
]


def get_nested(tree: Any, key: "str | tuple[str, ...]") -> Any:
    """Fetch ``tree[key]`` where ``key`` may be a tuple path into nested
    mappings (the view-requirement key convention)."""
    if isinstance(key, tuple):
        for k in key:
            tree = tree[k]
        return tree
    return tree[key]


def set_nested(out: dict, key: "str | tuple[str, ...]", value: Any) -> None:
    """Set ``out[key] = value`` where ``key`` may be a tuple path,
    creating intermediate dicts."""
    if isinstance(key, tuple):
        d = out
        for k in key[:-1]:
            d = d.setdefault(k, {})
        d[key[-1]] = value
    else:
        out[key] = value


@contextmanager
def profile_ms() -> Generator[Callable[[], float], None, None]:
    """Profiling context manager returning elapsed milliseconds
    (``_utils.py:118-125``)."""
    start = time.perf_counter_ns()
    yield lambda: (time.perf_counter_ns() - start) / 1e6


def reduce_stats(x: dict[str, list[float]], /) -> dict[str, float]:
    """Reduce lists of metrics into scalars, dispatching on the key's
    ``/``-suffix (``_utils.py:128-144``)."""
    y: dict[str, float] = {}
    for k, v in x.items():
        op = k.split("/")[-1]
        match op:
            case "min":
                y[k] = min(v)
            case "max":
                y[k] = max(v)
            case "mean":
                y[k] = sum(v) / len(v)
            case "std":
                y[k] = (sum(s**2 for s in v) / len(v)) ** 0.5
            case _:
                y[k] = sum(v)
    return y


def memory_stats() -> dict[str, Any]:
    """Return memory stats for the primary backend device, falling back to
    host memory (``_utils.py:102-115``)."""
    import jax

    device = jax.local_devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        total = stats["bytes_limit"]
        used = stats.get("bytes_in_use", 0)
        free = total - used
    else:
        try:
            import psutil

            svmem = psutil.virtual_memory()
            free, total = svmem.free, svmem.total
        except ImportError:
            return {}
    return {
        "memory/free": free,
        "memory/total": total,
        "memory/percent": 100 * (total - free) / total if total else 0.0,
    }


class CumulativeAverage:
    """Running cumulative average (``_utils.py:228-256``).

    Examples:
        >>> from rl8_tpu.utils import CumulativeAverage
        >>> ca = CumulativeAverage()
        >>> ca.update(0.0)
        0.0
        >>> ca.update(2.0)
        1.0

    """

    avg: float
    n: int

    def __init__(self) -> None:
        self.avg = 0.0
        self.n = 0

    def update(self, value: float, /) -> float:
        self.avg = (value + self.n * self.avg) / (self.n + 1)
        self.n += 1
        return self.avg
