"""Checkpoint/resume tests (a capability beyond the reference; see
SURVEY.md section 5)."""

import jax
import pytest
import numpy as np

from rl8_tpu import AlgorithmConfig, RecurrentAlgorithmConfig
from rl8_tpu.checkpoint import restore_checkpoint, save_checkpoint
from rl8_tpu.env import DiscreteDummyEnv

pytestmark = pytest.mark.slow  # end-to-end drives; excluded from `-m 'not slow'`

CFG = dict(num_envs=8, horizon=4, model_config={"hiddens": (8,)}, seed=7)


def test_checkpoint_round_trip_bit_exact(tmp_path) -> None:
    """Training resumed from a checkpoint matches uninterrupted training."""
    algo = AlgorithmConfig(**CFG).build(DiscreteDummyEnv)
    algo.collect()
    algo.step()
    save_checkpoint(tmp_path / "ckpt", algo, trainer_state={"algorithm/steps": 1})

    # Continue the original run.
    algo.collect()
    stats_a = algo.step()
    params_a = jax.device_get(algo.state.params)

    # Restore into a fresh algorithm and continue identically.
    algo_b = AlgorithmConfig(**CFG).build(DiscreteDummyEnv)
    trainer_state = restore_checkpoint(tmp_path / "ckpt", algo_b)
    assert trainer_state == {"algorithm/steps": 1}
    algo_b.collect()
    stats_b = algo_b.step()
    params_b = jax.device_get(algo_b.state.params)

    for key in ("losses/total", "losses/policy", "monitors/kl_div"):
        assert abs(stats_a[key] - stats_b[key]) < 1e-6, key
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), params_a, params_b
    )


def test_recurrent_checkpoint_round_trip(tmp_path) -> None:
    cfg = dict(
        num_envs=8,
        horizon=4,
        seq_len=2,
        seqs_per_state_reset=2,
        model_config={"hidden_size": 8},
        seed=7,
    )
    algo = RecurrentAlgorithmConfig(**cfg).build(DiscreteDummyEnv)
    algo.collect()
    algo.step()
    save_checkpoint(tmp_path / "ckpt", algo)
    algo_b = RecurrentAlgorithmConfig(**cfg).build(DiscreteDummyEnv)
    restore_checkpoint(tmp_path / "ckpt", algo_b)
    assert int(algo_b.state.horizons) == 1
    assert int(algo_b.state.seqs) == int(algo.state.seqs)


def test_trainer_periodic_checkpoint_and_resume(tmp_path) -> None:
    """Trainer.run checkpoints every `steps_per_checkpoint`; a freshly
    constructed trainer restores and continues with identical state."""
    from rl8_tpu import AlgorithmConfig, Trainer
    from rl8_tpu.conditions import HitsUpperBound
    from rl8_tpu.env import DiscreteDummyEnv

    def make():
        algo = AlgorithmConfig(
            num_envs=16, horizon=4, model_config={"hiddens": (8,)}, seed=7
        ).build(DiscreteDummyEnv)
        return Trainer(algo)

    trainer = make()
    trainer.run(
        stop_conditions=[HitsUpperBound("algorithm/steps", 4)],
        steps_per_checkpoint=2,
        checkpoint_dir=tmp_path / "ckpt",
    )
    assert trainer.state["algorithm/steps"] == 4

    resumed = make()
    resumed.restore_checkpoint(tmp_path / "ckpt")
    assert resumed.state["algorithm/steps"] == 4
    assert resumed.state["env/steps"] == trainer.state["env/steps"]
    # Continued training proceeds from the restored counters and state.
    stats = resumed.run(stop_conditions=[HitsUpperBound("algorithm/steps", 6)])
    assert resumed.state["algorithm/steps"] == 6
    assert "losses/total" in stats


def test_trainer_checkpoint_requires_dir() -> None:
    from rl8_tpu import AlgorithmConfig, Trainer
    from rl8_tpu.env import DiscreteDummyEnv

    algo = AlgorithmConfig(
        num_envs=16, horizon=4, model_config={"hiddens": (8,)}
    ).build(DiscreteDummyEnv)
    with pytest.raises(ValueError):
        Trainer(algo).run(steps_per_checkpoint=2)


def test_sharded_checkpoint_round_trip(tmp_path) -> None:
    """Checkpoint/restore preserves state and shardings under a mesh,
    and training continues after restore."""
    from rl8_tpu.data import DataKeys
    from rl8_tpu.parallel import create_mesh

    def make():
        return AlgorithmConfig(
            num_envs=16, horizon=4, model_config={"hiddens": (8,)},
            mesh=create_mesh(), seed=5,
        ).build(DiscreteDummyEnv)

    algo = make()
    algo.collect()
    algo.step()
    algo.collect()
    save_checkpoint(tmp_path / "ckpt", algo)

    restored = make()
    restore_checkpoint(tmp_path / "ckpt", restored)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))
        ),
        algo.state.params,
        restored.state.params,
    )
    assert not restored.state.buffer[DataKeys.OBS].sharding.is_fully_replicated
    restored.step()
    restored.collect()

def test_trainer_run_auto_resumes_from_checkpoint_dir(tmp_path) -> None:
    """Re-running `run(checkpoint_dir=...)` after an interruption picks
    up from the last checkpoint automatically (preemption-safe restart
    loops need no extra code); `resume=False` starts over."""
    from rl8_tpu import AlgorithmConfig, Trainer
    from rl8_tpu.conditions import HitsUpperBound
    from rl8_tpu.env import DiscreteDummyEnv

    def make():
        algo = AlgorithmConfig(
            num_envs=16, horizon=4, model_config={"hiddens": (8,)}, seed=7
        ).build(DiscreteDummyEnv)
        return Trainer(algo)

    ckpt = tmp_path / "ckpt"
    trainer = make()
    trainer.run(
        stop_conditions=[HitsUpperBound("algorithm/steps", 3)],
        steps_per_checkpoint=1,
        checkpoint_dir=ckpt,
    )

    # Same command re-run "after a preemption": resumes at step 3.
    resumed = make()
    resumed.run(
        stop_conditions=[HitsUpperBound("algorithm/steps", 5)],
        steps_per_checkpoint=1,
        checkpoint_dir=ckpt,
    )
    assert resumed.state["algorithm/steps"] == 5
    assert resumed.state["env/steps"] == 5 * 16 * 4

    # Rerunning a COMPLETED job must not train past its bound (the
    # restart loop reruns the same command unconditionally): the stop
    # condition is checked against the restored counters before any
    # step runs.
    done = make()
    done.run(
        stop_conditions=[HitsUpperBound("algorithm/steps", 5)],
        steps_per_checkpoint=1,
        checkpoint_dir=ckpt,
    )
    assert done.state["algorithm/steps"] == 5

    # resume=False ignores the existing checkpoint and starts fresh.
    fresh = make()
    fresh.run(
        stop_conditions=[HitsUpperBound("algorithm/steps", 1)],
        steps_per_checkpoint=1,
        checkpoint_dir=ckpt,
        resume=False,
    )
    assert fresh.state["algorithm/steps"] == 1


def test_checkpoint_versioning_prunes_and_survives_partial_saves(tmp_path) -> None:
    """Saves are versioned with an atomically-updated latest.json: an
    interrupted save (partial generation dir, latest.json not yet
    updated) leaves resume pointing at the last COMPLETE checkpoint, and
    only two generations are retained."""
    import json
    import os

    from rl8_tpu.checkpoint import checkpoint_exists

    algo = AlgorithmConfig(**CFG).build(DiscreteDummyEnv)
    algo.collect()
    algo.step()
    d = tmp_path / "ckpt"
    save_checkpoint(d, algo, trainer_state={"algorithm/steps": 1})
    save_checkpoint(d, algo, trainer_state={"algorithm/steps": 2})
    save_checkpoint(d, algo, trainer_state={"algorithm/steps": 3})

    gens = sorted(e for e in os.listdir(d) if e.startswith("ckpt-"))
    assert gens == ["ckpt-00000002", "ckpt-00000003"], gens

    # Simulate a preemption mid-save: a partial generation dir exists
    # but latest.json was never updated.
    (d / "ckpt-00000004").mkdir()
    (d / "ckpt-00000004" / "state").mkdir()
    assert checkpoint_exists(d)
    restored = AlgorithmConfig(**CFG).build(DiscreteDummyEnv)
    trainer_state = restore_checkpoint(d, restored)
    assert trainer_state == {"algorithm/steps": 3}

    # The next save supersedes the debris with a fresh generation 4.
    save_checkpoint(d, algo, trainer_state={"algorithm/steps": 4})
    with open(d / "latest.json") as f:
        assert json.load(f)["checkpoint"] == "ckpt-00000004"
    trainer_state = restore_checkpoint(d, AlgorithmConfig(**CFG).build(DiscreteDummyEnv))
    assert trainer_state == {"algorithm/steps": 4}


def test_async_checkpoint_defers_publish_and_round_trips(tmp_path) -> None:
    """``block=False`` snapshots the state and returns; training mutates
    the live state while the write runs, the generation publishes on
    :func:`wait_for_checkpoint`, and restore yields the SAVE-time
    snapshot bit-exactly."""
    import json

    import rl8_tpu.checkpoint as ck

    algo = AlgorithmConfig(**CFG).build(DiscreteDummyEnv)
    algo.collect()
    algo.step()
    d = tmp_path / "ckpt"
    save_checkpoint(
        d, algo, trainer_state={"algorithm/steps": 1}, block=False
    )
    assert ck._PENDING is not None
    params_saved = jax.device_get(algo.state.params)

    # Training overlaps the background write.
    algo.collect()
    algo.step()

    ck.wait_for_checkpoint()
    assert ck._PENDING is None
    with open(d / "latest.json") as f:
        assert json.load(f)["checkpoint"] == "ckpt-00000001"

    algo_b = AlgorithmConfig(**CFG).build(DiscreteDummyEnv)
    trainer_state = restore_checkpoint(d, algo_b)
    assert trainer_state == {"algorithm/steps": 1}
    # The restored params are the save-time snapshot, not the values the
    # overlapping training step produced.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        params_saved,
        jax.device_get(algo_b.state.params),
    )


def test_back_to_back_async_saves_sequence_generations(tmp_path) -> None:
    """A second async save finishes (and publishes) the pending one
    before starting, so generations sequence correctly; restore sees the
    newest via its implicit wait."""
    import json

    algo = AlgorithmConfig(**CFG).build(DiscreteDummyEnv)
    algo.collect()
    algo.step()
    d = tmp_path / "ckpt"
    save_checkpoint(d, algo, trainer_state={"algorithm/steps": 1}, block=False)
    algo.collect()
    algo.step()
    save_checkpoint(d, algo, trainer_state={"algorithm/steps": 2}, block=False)

    restored = AlgorithmConfig(**CFG).build(DiscreteDummyEnv)
    trainer_state = restore_checkpoint(d, restored)
    assert trainer_state == {"algorithm/steps": 2}
    assert int(restored.state.horizons) == 2
    with open(d / "latest.json") as f:
        assert json.load(f)["checkpoint"] == "ckpt-00000002"


def test_trainer_async_checkpoints_durable_after_run(tmp_path) -> None:
    """``Trainer.run(async_checkpoints=True)``: all periodic checkpoints
    are published by the time run returns, and a fresh trainer resumes
    from the final one."""
    from rl8_tpu import Trainer
    from rl8_tpu.checkpoint import checkpoint_exists
    from rl8_tpu.conditions import HitsUpperBound

    def make():
        algo = AlgorithmConfig(
            num_envs=16, horizon=4, model_config={"hiddens": (8,)}, seed=7
        ).build(DiscreteDummyEnv)
        return Trainer(algo)

    trainer = make()
    trainer.run(
        stop_conditions=[HitsUpperBound("algorithm/steps", 4)],
        steps_per_checkpoint=2,
        checkpoint_dir=tmp_path / "ckpt",
        async_checkpoints=True,
    )
    assert checkpoint_exists(tmp_path / "ckpt")
    resumed = make()
    resumed.restore_checkpoint(tmp_path / "ckpt")
    assert resumed.state["algorithm/steps"] == 4
    assert resumed.state["env/steps"] == trainer.state["env/steps"]


def test_checkpoint_round_trips_through_url_scheme_path(tmp_path) -> None:
    """Checkpoint paths may be object-store style URLs: every host-side
    file op goes through ``etils.epath`` (the same interface ``gs://``
    uses), never a plain ``open`` on the raw string. Proven by
    registering a ``mock://`` epath scheme that maps to a local root and
    round-tripping save -> exists -> restore through the URL form."""
    from etils.epath import register
    from etils.epath.register import _URI_PREFIXES_TO_CLS

    from rl8_tpu.checkpoint import checkpoint_exists

    root = tmp_path / "bucket"
    root.mkdir()
    local_cls = type(__import__("etils.epath", fromlist=["epath"]).Path("/tmp"))

    class MockPath(local_cls):
        def __init__(self, *parts):
            parts = tuple(
                str(p).replace("mock://", str(root) + "/") for p in parts
            )
            super().__init__(*parts)

    register.register_path_cls("mock://")(MockPath)
    try:
        algo = AlgorithmConfig(**CFG).build(DiscreteDummyEnv)
        algo.collect()
        algo.step()
        assert not checkpoint_exists("mock://run/ckpt")
        save_checkpoint("mock://run/ckpt", algo, trainer_state={"algorithm/steps": 1})
        assert checkpoint_exists("mock://run/ckpt")
        # Everything landed under the scheme's root, not under a literal
        # "mock:" directory or the CWD.
        assert (root / "run" / "ckpt" / "latest.json").exists()

        restored = AlgorithmConfig(**CFG).build(DiscreteDummyEnv)
        trainer_state = restore_checkpoint("mock://run/ckpt", restored)
        assert trainer_state == {"algorithm/steps": 1}
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))
            ),
            algo.state.params,
            restored.state.params,
        )
    finally:
        _URI_PREFIXES_TO_CLS.pop("mock://", None)


def test_cross_topology_restore_bit_exact(tmp_path) -> None:
    """A checkpoint saved sharded over 8 devices restores onto a
    4-device mesh AND onto an unsharded single-device algorithm
    bit-exactly: restore args carry the restoring algorithm's shardings,
    so orbax reshards instead of assuming the saved topology."""
    from rl8_tpu.data import DataKeys
    from rl8_tpu.parallel import create_mesh

    def make(mesh=None):
        return AlgorithmConfig(
            num_envs=16, horizon=4, model_config={"hiddens": (8,)},
            mesh=mesh, seed=5,
        ).build(DiscreteDummyEnv)

    algo8 = make(create_mesh(jax.devices()))
    algo8.collect()
    algo8.step()
    algo8.collect()
    save_checkpoint(tmp_path / "ckpt", algo8)

    def assert_state_equal(a, b):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(jax.device_get(x)), np.asarray(jax.device_get(y))
            ),
            a,
            b,
        )

    # Restore onto a 4-device mesh.
    algo4 = make(create_mesh(jax.devices()[:4]))
    restore_checkpoint(tmp_path / "ckpt", algo4)
    assert_state_equal(algo8.state.params, algo4.state.params)
    assert_state_equal(algo8.state.buffer, algo4.state.buffer)
    assert len(algo4.state.buffer[DataKeys.OBS].sharding.device_set) == 4
    algo4.step()  # training continues on the new topology
    algo4.collect()

    # Restore onto a plain unsharded algorithm.
    algo1 = make()
    restore_checkpoint(tmp_path / "ckpt", algo1)
    assert_state_equal(algo8.state.params, algo1.state.params)
    assert_state_equal(algo8.state.buffer, algo1.state.buffer)
    algo1.step()


def test_wait_for_checkpoint_attributes_background_failure(tmp_path) -> None:
    """A failed async write surfaces as a RuntimeError naming the
    checkpoint generation (not as an error blamed on whichever later
    call flushed it), the checkpointer is closed, and the pending slot
    is cleared so later calls don't re-raise."""
    from rl8_tpu import checkpoint as ck

    class Boom:
        closed = False

        def wait_until_finished(self):
            raise OSError("disk full")

        def close(self):
            self.closed = True

    boom = Boom()
    assert ck._PENDING is None
    ck._PENDING = (boom, ck._as_path(str(tmp_path)), "ckpt-00000001", 1)
    with pytest.raises(RuntimeError, match="ckpt-00000001"):
        ck.wait_for_checkpoint()
    assert boom.closed
    assert ck._PENDING is None
    ck.wait_for_checkpoint()  # no-op; the failure isn't raised twice
    # The never-published generation doesn't count as a checkpoint.
    assert not ck.checkpoint_exists(tmp_path)


def test_checkpoint_exists_agree_single_process(tmp_path) -> None:
    """`agree=True` (the trainer's multi-host resume decision) matches
    the local answer in single-process runs."""
    from rl8_tpu.checkpoint import checkpoint_exists

    assert not checkpoint_exists(tmp_path / "ckpt", agree=True)
    algo = AlgorithmConfig(**CFG).build(DiscreteDummyEnv)
    algo.collect()
    algo.step()
    save_checkpoint(tmp_path / "ckpt", algo)
    assert checkpoint_exists(tmp_path / "ckpt", agree=True)


def test_run_async_checkpoints_requires_dir() -> None:
    from rl8_tpu import AlgorithmConfig, Trainer
    from rl8_tpu.env import DiscreteDummyEnv

    algo = AlgorithmConfig(
        num_envs=16, horizon=4, model_config={"hiddens": (8,)}
    ).build(DiscreteDummyEnv)
    with pytest.raises(ValueError, match="async_checkpoints"):
        Trainer(algo).run(async_checkpoints=True)
