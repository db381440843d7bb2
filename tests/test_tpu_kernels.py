"""On-TPU equivalence tests for the fused Pallas kernels.

The CPU suite pins fused-vs-autodiff equivalence in interpret mode
(``tests/test_ops.py``); these run the REAL Mosaic-compiled kernels on
hardware and compare a full training step against the XLA autodiff path
under identical rollouts (fused acting disabled so both paths share the
threefry RNG stream). Run with::

    RL8_TPU_TESTS_ON_TPU=1 python -m pytest tests -m tpu
"""

import math

import jax
import pytest

pytestmark = pytest.mark.tpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


requires_tpu = pytest.mark.skipif(
    not _on_tpu(), reason="requires real TPU hardware (Mosaic kernels)"
)

_KEYS = (
    "losses/total",
    "losses/policy",
    "losses/vf",
    "monitors/kl_div",
)


def _first_step(fused: bool, recurrent: bool, num_sgd_iters: int):
    from rl8_tpu import AlgorithmConfig, RecurrentAlgorithmConfig
    from rl8_tpu.env import DiscreteDummyEnv

    kwargs = dict(
        num_envs=256,
        horizon=8,
        seed=13,
        entropy_coeff=0.01,
        num_sgd_iters=num_sgd_iters,
        fused_update=fused,
        fused_act=False,  # identical threefry rollouts on both paths
    )
    if recurrent:
        algo = RecurrentAlgorithmConfig(
            **kwargs,
            seq_len=4,
            seqs_per_state_reset=2,
            model_config={"hidden_size": 32},
        ).build(DiscreteDummyEnv)
    else:
        algo = AlgorithmConfig(
            **kwargs, model_config={"hiddens": (32, 32)}
        ).build(DiscreteDummyEnv)
    algo.collect()
    return algo.step()


@requires_tpu
@pytest.mark.parametrize("recurrent", [False, True])
def test_fused_update_matches_autodiff_on_hardware(recurrent: bool) -> None:
    """The Mosaic-compiled fused update kernel matches the XLA autodiff
    path on identical rollouts.

    With one SGD epoch (whole-buffer minibatch) the recorded losses come
    from identical parameters, so they must agree to bf16-matmul
    rounding. Over 4 epochs the per-update rounding differences compound
    through the optimizer, so only statistical-level agreement is
    expected there.
    """
    fused1 = _first_step(True, recurrent, 1)
    unfused1 = _first_step(False, recurrent, 1)
    for key in _KEYS:
        assert math.isclose(
            fused1[key], unfused1[key], rel_tol=5e-3, abs_tol=5e-4
        ), (key, fused1[key], unfused1[key])

    fused4 = _first_step(True, recurrent, 4)
    unfused4 = _first_step(False, recurrent, 4)
    for key in _KEYS:
        assert math.isclose(
            fused4[key], unfused4[key], rel_tol=5e-2, abs_tol=5e-3
        ), (key, fused4[key], unfused4[key])
