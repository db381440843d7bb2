"""Debugging and profiling aids.

SURVEY.md section 5 analogs: the reference's only tracing is wall-clock
``profile_ms`` counters; its "sanitizer" is strict shape validation.
The TPU build keeps both and adds:

- :func:`trace`: capture a ``jax.profiler`` device trace around a code
  block (viewable in TensorBoard/Perfetto);
- :func:`debug_nans`: enable JAX NaN-checking so the first NaN produced
  inside a jitted program raises with a traceback instead of silently
  corrupting training.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Generator

import jax

__all__ = ["trace", "debug_nans"]


@contextmanager
def trace(log_dir: str, /) -> Generator[None, None, None]:
    """Capture a device profile of the enclosed block into ``log_dir``.

    Examples:
        >>> from rl8_tpu.utils.debugging import trace
        >>> with trace("/tmp/rl8-trace"):  # doctest: +SKIP
        ...     algo.collect()
        ...     algo.step()

    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def debug_nans(enable: bool = True, /) -> Generator[None, None, None]:
    """Enable JAX NaN debugging for the enclosed block.

    Compiled programs re-trace with NaN checks; expect a slowdown. Use
    when a run diverges to find the first NaN-producing op.
    """
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
