"""Drift regression on the committed learning-curve artifacts.

``benchmarks/curves/reference/`` holds ground-truth curves recorded by
running the REFERENCE library itself (``benchmarks/reference_impl``);
``benchmarks/curves/`` holds ours at the same hyperparameters. This
test re-asserts the parity criterion on every commit, so a regression
that changes learning behavior (or a curve file that silently goes
stale) fails the fast suite without any training at test time.
Re-record with ``python -m benchmarks.parity`` (ours, on TPU) and
``python -m benchmarks.reference_impl.record`` (reference, CPU).
"""

from __future__ import annotations

import pytest

from benchmarks.parity import CONFIGS, check_parity


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_committed_curves_reach_reference_band(name: str) -> None:
    summary = check_parity(name)
    assert summary["ours_final_returns"], summary


@pytest.mark.parametrize("name", ["cartpole", "algotrading", "recurrent"])
def test_committed_shuffle_ab_curves_indistinguishable(name: str) -> None:
    """The shuffle_block_rows=8 default deviation is backed by DATA:
    blk=8 learning curves sit inside blk=1's (exact reference-semantics)
    seed band on both parity criteria, on the committed A/B curves
    (``benchmarks/ab_shuffle.py``; minibatched configs where the epoch
    shuffle actually executes)."""
    from benchmarks.ab_shuffle import check_ab

    summary = check_ab(name)
    assert summary["blk8_final_returns"], summary
