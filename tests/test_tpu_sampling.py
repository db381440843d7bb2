"""On-TPU statistical tests for the hardware-PRNG sampling kernels.

The fused acting kernels (``rl8_tpu/ops/fused_act.py``) draw randomness
from the TPU's hardware PRNG (``pltpu.prng_random_bits``), which the
Pallas interpreter does NOT model faithfully (``docs/kernels.md``), so
these distributional checks only mean anything on real hardware. They
are marked ``tpu`` and skipped elsewhere; run them with::

    RL8_TPU_TESTS_ON_TPU=1 python -m pytest tests -m tpu

Checks: the fused kernels' action samples match the model-implied
distributions — chi-square-style frequency comparison for Categorical,
moment + Kolmogorov–Smirnov checks for Normal/SquashedNormal — and the
sampled actions' log-probs agree with the XLA (threefry) path's logp
formulas evaluated at those actions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


requires_tpu = pytest.mark.skipif(
    not _on_tpu(), reason="requires real TPU hardware (hardware PRNG)"
)

B = 1 << 15  # samples per statistical check


def _policy(discrete: bool):
    from rl8_tpu.policies import Policy
    from rl8_tpu.specs import Discrete, Unbounded

    action_spec = Discrete(3, shape=(1,)) if discrete else Unbounded(1)
    policy = Policy(Unbounded(1), action_spec)
    params = policy.init_params(jax.random.key(0))
    return policy, params


@requires_tpu
def test_fused_act_categorical_frequencies() -> None:
    """Empirical action frequencies from the fused kernel match the
    model's softmax probabilities (and the threefry path's)."""
    from rl8_tpu.data import DataKeys
    from rl8_tpu.ops.fused_act import fused_act

    policy, params = _policy(discrete=True)
    obs = jnp.ones((B, 1), dtype=jnp.float32)
    batch = {DataKeys.OBS: obs}

    features, _ = policy.model.apply({"params": params}, batch)
    probs = np.asarray(jax.nn.softmax(features["logits"][0, 0]))

    actions, logp, _ = fused_act(
        policy.model, params, batch, jax.random.key(1)
    )
    counts = np.bincount(np.asarray(actions).ravel(), minlength=3) / B

    # ~4-sigma binomial bound per category.
    tol = 4.0 * np.sqrt(np.maximum(probs * (1 - probs), 1e-4) / B)
    np.testing.assert_array_less(np.abs(counts - probs), tol + 1e-3)

    # logp of the sampled action equals log softmax at that action.
    log_probs = np.asarray(jax.nn.log_softmax(features["logits"][0, 0]))
    np.testing.assert_allclose(
        np.asarray(logp).ravel(),
        log_probs[np.asarray(actions).ravel()],
        rtol=1e-4,
        atol=1e-4,
    )

    # Threefry-path frequencies agree within the same bound.
    dist = policy.distribution_cls(features, policy.model)
    ref_actions = np.asarray(dist.sample(jax.random.key(2))).ravel()
    ref_counts = np.bincount(ref_actions, minlength=3) / B
    np.testing.assert_array_less(np.abs(ref_counts - probs), tol + 1e-3)


def _ks_statistic(samples: np.ndarray, cdf) -> float:
    x = np.sort(samples)
    n = len(x)
    c = cdf(x)
    upper = np.max(np.arange(1, n + 1) / n - c)
    lower = np.max(c - np.arange(0, n) / n)
    return float(max(upper, lower))


@requires_tpu
@pytest.mark.parametrize("squashed", [False, True])
def test_fused_act_normal_ks(squashed: bool) -> None:
    """KS test of fused continuous samples against the model-implied
    Normal (pre-squash for SquashedNormal), plus logp agreement with the
    XLA formulas at the sampled actions."""
    from rl8_tpu.data import DataKeys
    from rl8_tpu.distributions import Normal, SquashedNormal
    from rl8_tpu.ops.fused_act import fused_act

    policy, params = _policy(discrete=False)
    obs = jnp.ones((B, 1), dtype=jnp.float32)
    batch = {DataKeys.OBS: obs}

    features, _ = policy.model.apply({"params": params}, batch)
    mean = float(features["mean"][0, 0])
    std = float(jnp.exp(features["log_std"][0, 0]))

    actions, logp, _ = fused_act(
        policy.model, params, batch, jax.random.key(3), squashed=squashed
    )
    samples = np.asarray(actions, dtype=np.float64).ravel()
    raw = np.arctanh(np.clip(samples, -1 + 1e-7, 1 - 1e-7)) if squashed else samples

    # Moments: ~5-sigma bounds on the sample mean and std.
    se_mean = std / np.sqrt(B)
    assert abs(raw.mean() - mean) < 5 * se_mean
    assert abs(raw.std() - std) < 5 * std / np.sqrt(2 * B)

    # KS statistic vs the exact Normal CDF. 1.36/sqrt(n) is the 5%
    # critical value; allow 2x for bf16/f32 rounding of the transform.
    from math import erf, sqrt

    cdf = lambda x: 0.5 * (1.0 + np.vectorize(erf)((x - mean) / (std * sqrt(2.0))))
    ks = _ks_statistic(raw, cdf)
    assert ks < 2 * 1.36 / np.sqrt(B), f"KS statistic {ks:.4f} too large"

    # logp agreement with the XLA distribution math at the sampled actions.
    dist_cls = SquashedNormal if squashed else Normal
    dist = dist_cls(features, policy.model)
    ref_logp = np.asarray(dist.logp(actions)).ravel()
    np.testing.assert_allclose(
        np.asarray(logp).ravel(), ref_logp, rtol=2e-3, atol=2e-3
    )
