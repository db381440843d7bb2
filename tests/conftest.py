"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths can
be exercised without TPU hardware (the JAX-idiomatic analog of the
reference's CPU-only CI, ``/root/reference/.github/workflows/test.yml``).
The env vars must be set before JAX initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
