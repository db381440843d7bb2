"""Config-space fuzz: random hyperparameter combinations either build
and train cleanly or are rejected with a clear validation error — never
an internal crash (shape error, trace failure, NaN explosion)."""

import random

import pytest

from rl8_tpu import AlgorithmConfig, RecurrentAlgorithmConfig
from rl8_tpu.env import ContinuousDummyEnv, DiscreteDummyEnv

pytestmark = pytest.mark.slow  # end-to-end drives; excluded from `-m 'not slow'`


def _random_kwargs(rng: random.Random) -> dict:
    return dict(
        num_envs=rng.choice([1, 2, 7, 16]),
        horizon=rng.choice([1, 2, 3, 8]),
        horizons_per_env_reset=rng.choice([-1, 1, 2, 3]),
        num_sgd_iters=rng.choice([1, 2]),
        sgd_minibatch_size=rng.choice([None, 1, 4, 8, 1000]),
        accumulate_grads=rng.choice([False, True]),
        gamma=rng.choice([0.5, 1.0]),
        gae_lambda=rng.choice([0.5, 1.0]),
        dual_clip_param=rng.choice([None, 2.0]),
        target_kl_div=rng.choice([None, 0.1]),
        entropy_coeff=rng.choice([0.0, 0.01]),
        shuffle_minibatches=rng.choice([False, True]),
    )


@pytest.mark.parametrize("seed", range(12))
def test_random_config_builds_or_rejects_cleanly(seed: int) -> None:
    rng = random.Random(seed)
    kw = _random_kwargs(rng)
    env_cls = rng.choice([DiscreteDummyEnv, ContinuousDummyEnv])
    try:
        if rng.random() < 0.5:
            algo = RecurrentAlgorithmConfig(
                **kw,
                seq_len=rng.choice([1, 2]),
                seqs_per_state_reset=rng.choice([-1, 1, 2]),
                model_config={"hidden_size": 8},
            ).build(env_cls)
        else:
            algo = AlgorithmConfig(
                **kw, model_config={"hiddens": (8,)}
            ).build(env_cls)
    except (ValueError, RuntimeError):
        return  # clean validation rejection
    algo.collect()
    algo.step()
    algo.collect()
    algo.step()
