"""Trainer counter/guard semantics, mirroring
``/root/reference/tests/test_trainers.py``."""

import pytest

from rl8_tpu import (
    AlgorithmConfig,
    RecurrentAlgorithmConfig,
    RecurrentTrainer,
    Trainer,
)
from rl8_tpu.conditions import HitsUpperBound
from rl8_tpu.env import DiscreteDummyEnv

NUM_ENVS = 16
HORIZON = 8
HORIZONS_PER_ENV_RESET = 2

SMALL_FF = {"hiddens": (8,)}
SMALL_REC = {"hidden_size": 8}
# seq_len * seqs_per_state_reset must divide horizon * horizons_per_env_reset.
REC_KWARGS = {"seq_len": 2, "seqs_per_state_reset": 4}


def _ff_trainer() -> Trainer:
    return Trainer(
        AlgorithmConfig(
            num_envs=NUM_ENVS,
            horizon=HORIZON,
            horizons_per_env_reset=HORIZONS_PER_ENV_RESET,
            model_config=SMALL_FF,
        ).build(DiscreteDummyEnv)
    )


def _rec_trainer() -> RecurrentTrainer:
    return RecurrentTrainer(
        RecurrentAlgorithmConfig(
            num_envs=NUM_ENVS,
            horizon=HORIZON,
            horizons_per_env_reset=HORIZONS_PER_ENV_RESET,
            model_config=SMALL_REC,
            **REC_KWARGS,
        ).build(DiscreteDummyEnv)
    )


@pytest.mark.parametrize("make_trainer", [_ff_trainer, _rec_trainer])
def test_trainer_eval(make_trainer) -> None:
    trainer = make_trainer()
    assert trainer.state["algorithm/collects"] == 0
    assert trainer.state["algorithm/steps"] == 0
    assert trainer.state["env/steps"] == 0
    trainer.eval()
    assert trainer.state["algorithm/collects"] == HORIZONS_PER_ENV_RESET
    assert trainer.state["algorithm/steps"] == 0


@pytest.mark.parametrize("make_trainer", [_ff_trainer, _rec_trainer])
@pytest.mark.slow
def test_trainer_eval_runtime_error(make_trainer) -> None:
    trainer = make_trainer()
    trainer.step()
    with pytest.raises(RuntimeError):
        trainer.eval()


@pytest.mark.parametrize("make_trainer", [_ff_trainer, _rec_trainer])
@pytest.mark.slow
def test_trainer_step(make_trainer) -> None:
    trainer = make_trainer()
    trainer.step()
    assert trainer.state["algorithm/collects"] == 1
    assert trainer.state["algorithm/steps"] == 1
    assert trainer.state["env/steps"] == NUM_ENVS * HORIZON


@pytest.mark.parametrize("make_trainer", [_ff_trainer, _rec_trainer])
@pytest.mark.slow
def test_trainer_run(make_trainer) -> None:
    trainer = make_trainer()
    trainer.run(
        steps_per_eval=HORIZONS_PER_ENV_RESET,
        stop_conditions=[
            HitsUpperBound("algorithm/collects", 2 * HORIZONS_PER_ENV_RESET + 1)
        ],
    )
    assert trainer.state["algorithm/collects"] == 2 * HORIZONS_PER_ENV_RESET + 1
    assert trainer.state["algorithm/steps"] == HORIZONS_PER_ENV_RESET + 1


@pytest.mark.parametrize("make_trainer", [_ff_trainer, _rec_trainer])
def test_trainer_run_value_error(make_trainer) -> None:
    trainer = make_trainer()
    with pytest.raises(ValueError):
        trainer.run(steps_per_eval=1)


@pytest.mark.parametrize("make_trainer", [_ff_trainer, _rec_trainer])
@pytest.mark.slow
def test_trainer_run_fused(make_trainer) -> None:
    trainer = make_trainer()
    stats = trainer.run(
        fused_steps=2,
        stop_conditions=[HitsUpperBound("algorithm/steps", 4)],
    )
    assert trainer.state["algorithm/steps"] == 4
    assert stats["algorithm/steps"] == 4


def test_trainer_fused_eval_cadence() -> None:
    trainer = _ff_trainer()
    with pytest.raises(ValueError):
        trainer.run(fused_steps=3, steps_per_eval=4)


def test_fused_steps_checkpoint_cadence_validated(tmp_path) -> None:
    """A steps_per_checkpoint that isn't a multiple of fused_steps is
    rejected (the step counter only lands on fused_steps multiples, so
    any other cadence silently degrades to their lcm)."""
    from rl8_tpu import AlgorithmConfig, Trainer
    from rl8_tpu.env import DiscreteDummyEnv

    algo = AlgorithmConfig(
        num_envs=8, horizon=4, model_config={"hiddens": (8,)}
    ).build(DiscreteDummyEnv)
    with pytest.raises(ValueError, match="steps_per_checkpoint"):
        Trainer(algo).run(
            fused_steps=8,
            steps_per_checkpoint=10,
            checkpoint_dir=tmp_path,
        )
