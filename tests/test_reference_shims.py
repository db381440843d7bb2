"""Fidelity guard for the reference-run shims.

The parity ground truth (``benchmarks/curves/reference/``) is produced
by running the REFERENCE library on top of
``benchmarks/reference_impl/shims``. This test re-runs the reference's
OWN test suite under those shims — if a shim behavior drifts from what
the reference expects, the recording pipeline is no longer trustworthy
and this fails before any curve does.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REFERENCE = "/root/reference"
SHIMS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks",
    "reference_impl",
    "shims",
)


@pytest.mark.slow
def test_reference_suite_passes_under_shims(tmp_path) -> None:
    if not os.path.isdir(os.path.join(REFERENCE, "tests")):
        pytest.skip("reference checkout not present")
    code = (
        "import sys;"
        f"sys.path.insert(0, {SHIMS!r});"
        f"sys.path.insert(0, {os.path.join(REFERENCE, 'src')!r});"
        f"sys.path.insert(0, {REFERENCE!r});"
        "import pytest;"
        f"sys.exit(pytest.main([{os.path.join(REFERENCE, 'tests')!r}, '-q',"
        " '--no-header', '-p', 'no:cacheprovider', '-p', 'no:randomly']))"
    )
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    result = subprocess.run(
        [sys.executable, "-c", code],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert result.returncode == 0, (
        "reference suite failed under the shims:\n"
        + result.stdout[-3000:]
        + result.stderr[-2000:]
    )
