"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths can
be exercised without TPU hardware (the JAX-idiomatic analog of the
reference's CPU-only CI, ``/root/reference/.github/workflows/test.yml``).

The surrounding environment may preset ``JAX_PLATFORMS`` to a real
accelerator and import jax at interpreter startup (sitecustomize), so the
platform must be forced via ``jax.config`` — env vars alone are too late.

Set ``RL8_TPU_TESTS_ON_TPU=1`` to leave the platform alone and run the
hardware-only tests (``-m tpu``) on a real TPU; everything else in the
suite assumes the CPU mesh and should be deselected in that mode.
"""

import os

_ON_TPU = bool(os.environ.get("RL8_TPU_TESTS_ON_TPU"))

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

    assert jax.default_backend() == "cpu", "tests must run on CPU"
    assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"

    # Persistent compilation cache: the suite is compile-dominated (the
    # kernel-equivalence and multihost tests each build multi-second XLA
    # programs with identical shapes run to run), so warm CI runs drop
    # from ~25 min to well under the 10-min budget. Keyed per JAX
    # version via the cache's own fingerprinting; safe to delete.
    _CACHE = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_cpu",
    )
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update(
        "jax_persistent_cache_enable_xla_caches", "all"
    )
