"""Preemption-aware training shutdown.

TPU pod VMs receive ``SIGTERM`` with a grace period before eviction
(maintenance events, spot/preemptible reclaims, autoscaler moves). The
reference has no notion of this — its only persistence is the terminal
policy export (``/root/reference/src/rl8/policies/_feedforward.py:178-190``),
so a preempted run loses everything. Here :class:`PreemptionMonitor`
catches the signal, every process agrees on it at the next step boundary
(a tiny host all-gather — ONE host's signal is enough, since schedulers
may deliver it to hosts at slightly different times), and
``Trainer.run`` saves a final collective checkpoint and returns cleanly;
rerunning the same command auto-resumes from it.

The monitor is deliberately self-contained (plain ``signal`` +
``multihost_utils.process_allgather``) rather than relying on
``jax.experimental.multihost_utils.reached_preemption_sync_point``,
which requires the coordination-service preemption plumbing that is
unavailable in single-process runs and in gloo-backed CPU test meshes.
"""

from __future__ import annotations

import signal
import threading
from types import FrameType
from typing import Any

import jax
import numpy as np

__all__ = ["PreemptionMonitor"]


class PreemptionMonitor:
    """Latches ``SIGTERM`` and answers "was ANY process preempted?".

    Usage::

        with PreemptionMonitor() as monitor:
            while training:
                step()
                if monitor.preempted():
                    save_checkpoint(...)
                    break

    ``install``/``uninstall`` save and restore the previous ``SIGTERM``
    disposition, and a previously-installed Python handler is chained
    (still called) so outer supervisors keep observing the signal.
    Installation is skipped WITH A WARNING off the main thread, where
    CPython forbids ``signal.signal`` — :meth:`request` remains
    available there.
    """

    def __init__(self) -> None:
        self._flag = False
        self._prev: Any = None
        self._installed = False

    def install(self) -> "PreemptionMonitor":
        """Register the ``SIGTERM`` handler (main thread only).

        Off the main thread (where CPython forbids ``signal.signal``)
        this warns and installs nothing — SIGTERM will then NOT trigger
        a final checkpoint; wire your own handler to :meth:`request` if
        you train from a worker thread.
        """
        if self._installed:
            return self
        if threading.current_thread() is not threading.main_thread():
            import warnings

            warnings.warn(
                "PreemptionMonitor.install() skipped: not on the main"
                " thread, so no SIGTERM handler was registered and a"
                " preemption will NOT trigger a final checkpoint. Call"
                " monitor.request() from your own signal handler to keep"
                " the protection.",
                RuntimeWarning,
                stacklevel=2,
            )
            return self
        self._prev = signal.signal(signal.SIGTERM, self._on_signal)
        self._installed = True
        return self

    def uninstall(self) -> None:
        """Restore the ``SIGTERM`` disposition that preceded
        :meth:`install`.

        A pre-existing handler that was not installed from Python
        (``signal.getsignal`` returned ``None``) cannot be re-installed
        from Python; ``SIG_DFL`` is set instead, with a warning.
        """
        if not self._installed:
            return
        if self._prev is None:
            import warnings

            warnings.warn(
                "The SIGTERM handler that preceded PreemptionMonitor was"
                " not installed from Python and cannot be restored;"
                " setting SIG_DFL instead.",
                RuntimeWarning,
                stacklevel=2,
            )
        signal.signal(
            signal.SIGTERM,
            self._prev if self._prev is not None else signal.SIG_DFL,
        )
        self._installed = False

    def _on_signal(self, signum: int, frame: None | FrameType) -> None:
        self._flag = True
        if callable(self._prev):
            self._prev(signum, frame)

    def request(self) -> None:
        """Latch the flag without a signal (manual shutdown requests,
        tests, and non-main-thread callers)."""
        self._flag = True

    @property
    def local_flag(self) -> bool:
        """This process's un-synced flag."""
        return self._flag

    def preempted(self) -> bool:
        """Whether ANY process has latched a preemption.

        In multi-process runs this is a COLLECTIVE: every process must
        call it the same number of times (``Trainer.run`` calls it once
        per step boundary, which is deterministic across processes).
        The all-gather is a few host-scalar bytes — negligible next to a
        training step.
        """
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.asarray(self._flag, dtype=np.int32)
            )
            return bool(np.any(flags))
        return self._flag

    def __enter__(self) -> "PreemptionMonitor":
        return self.install()

    def __exit__(self, *exc: Any) -> None:
        self.uninstall()
