"""Execute the docstring ``Examples:`` blocks as doctests.

The reference runs its docstring examples in CI via sphinx doctest
(``/root/reference/pyproject.toml:120-134``); here the CPU-safe modules'
examples run in the fast pytest suite so a stale example cannot ship
silently. Every listed module must contain at least one executed
example — a module whose examples all disappear (or get ``+SKIP``ed)
fails the count assertion rather than passing vacuously.
"""

from __future__ import annotations

import doctest
import importlib

import pytest

# Modules whose Examples: blocks run on CPU with tiny shapes. Ordered
# roughly by layer.
DOCTEST_MODULES = [
    "rl8_tpu.specs",
    "rl8_tpu.data",
    "rl8_tpu.env",
    "rl8_tpu.views",
    "rl8_tpu.distributions",
    "rl8_tpu.nn.functional",
    "rl8_tpu.models._feedforward",
    "rl8_tpu.conditions",
    "rl8_tpu.schedulers",
    "rl8_tpu.utils",
    "rl8_tpu.trainers.config",
    "rl8_tpu.policies.serving",
    "rl8_tpu.algorithms._feedforward",
]


@pytest.mark.parametrize("module_name", DOCTEST_MODULES)
def test_module_doctests(module_name: str) -> None:
    module = importlib.import_module(module_name)
    results = doctest.testmod(
        module,
        optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE,
        verbose=False,
    )
    assert results.failed == 0
    assert results.attempted > 0, (
        f"{module_name} has no executed doctest examples; add an"
        " Examples: block or drop it from DOCTEST_MODULES"
    )
