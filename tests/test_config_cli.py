"""TrainConfig file loading and CLI end-to-end tests."""

import json

import pytest

from rl8_tpu import TrainConfig
from rl8_tpu.__main__ import main
from rl8_tpu.env import DiscreteDummyEnv
from rl8_tpu.trainers import RecurrentTrainer, Trainer


def _write_yaml(tmp_path, text: str) -> str:
    p = tmp_path / "config.yaml"
    p.write_text(text)
    return str(p)


def test_train_config_from_yaml(tmp_path) -> None:
    path = _write_yaml(
        tmp_path,
        "env_cls: rl8_tpu.env.DiscreteDummyEnv\n"
        "algorithm_config:\n"
        "  horizon: 4\n"
        "  num_envs: 8\n"
        "  gamma: 1\n",
    )
    config = TrainConfig.from_file(path)
    assert config.env_cls is DiscreteDummyEnv
    trainer = config.build()
    assert isinstance(trainer, Trainer)
    assert trainer.algorithm.hparams.gamma == 1
    assert trainer.algorithm.hparams.horizon == 4


def test_train_config_recurrent_and_dotted_imports(tmp_path) -> None:
    path = _write_yaml(
        tmp_path,
        "env_cls: rl8_tpu.env.DiscreteDummyEnv\n"
        "recurrent: true\n"
        "algorithm_config:\n"
        "  horizon: 4\n"
        "  num_envs: 8\n"
        "  seq_len: 2\n"
        "  seqs_per_state_reset: 2\n"
        "  optimizer_cls: optax.sgd\n"
        "  distribution_cls: rl8_tpu.distributions.Categorical\n",
    )
    trainer = TrainConfig.from_file(path).build()
    assert isinstance(trainer, RecurrentTrainer)


def test_train_config_from_json(tmp_path) -> None:
    p = tmp_path / "config.json"
    p.write_text(
        json.dumps(
            {
                "env_cls": "rl8_tpu.env.DiscreteDummyEnv",
                "algorithm_config": {"horizon": 4, "num_envs": 8},
            }
        )
    )
    trainer = TrainConfig.from_file(p).build()
    assert isinstance(trainer, Trainer)


def test_train_config_requires_env_cls(tmp_path) -> None:
    path = _write_yaml(tmp_path, "algorithm_config: {}\n")
    with pytest.raises(RuntimeError):
        TrainConfig.from_file(path)


def test_train_config_bad_import(tmp_path) -> None:
    path = _write_yaml(tmp_path, "env_cls: not.a.real.Env\n")
    with pytest.raises(ImportError):
        TrainConfig.from_file(path)


def test_cli_train_and_save(tmp_path) -> None:
    """The `train` subcommand runs to the stop condition, tracks metrics,
    and exports the policy (``/root/reference/src/rl8/__main__.py:21-99``)."""
    config = _write_yaml(
        tmp_path,
        "env_cls: rl8_tpu.env.DiscreteDummyEnv\n"
        "algorithm_config:\n"
        "  horizon: 4\n"
        "  num_envs: 8\n"
        "  model_config:\n"
        "    hiddens: [8]\n",
    )
    save_dir = tmp_path / "saved"
    track_dir = tmp_path / "track"
    rc = main(
        [
            "train",
            "-f",
            config,
            "--max-steps",
            "2",
            "--save",
            str(save_dir),
            "--track-dir",
            str(track_dir),
        ]
    )
    assert rc == 0
    assert (save_dir / "policy.pkl").exists()
    metrics = (track_dir / "metrics.jsonl").read_text().strip().splitlines()
    assert len(metrics) == 2
    record = json.loads(metrics[-1])
    assert record["algorithm/steps"] == 2
    assert "losses/total" in record


def test_cli_async_checkpoints(tmp_path) -> None:
    """`--async-checkpoints` writes background checkpoints that are
    durable (published) by the time the command exits."""
    config = _write_yaml(
        tmp_path,
        "env_cls: rl8_tpu.env.DiscreteDummyEnv\n"
        "algorithm_config:\n"
        "  horizon: 4\n"
        "  num_envs: 8\n"
        "  model_config:\n"
        "    hiddens: [8]\n",
    )
    ckpt_dir = tmp_path / "ckpt"
    rc = main(
        [
            "train",
            "-f",
            config,
            "--max-steps",
            "2",
            "--track-dir",
            str(tmp_path / "track"),
            "--checkpoint-dir",
            str(ckpt_dir),
            "--async-checkpoints",
        ]
    )
    assert rc == 0
    from rl8_tpu.checkpoint import checkpoint_exists

    assert checkpoint_exists(ckpt_dir)
    latest = json.loads((ckpt_dir / "latest.json").read_text())
    assert latest["checkpoint"] == "ckpt-00000002"


def test_cli_fused_steps(tmp_path) -> None:
    """`--fused-steps` routes through Trainer.step_fused — same stats
    records and counters, one device program per batch."""
    config = _write_yaml(
        tmp_path,
        "env_cls: rl8_tpu.env.DiscreteDummyEnv\n"
        "algorithm_config:\n"
        "  horizon: 4\n"
        "  num_envs: 8\n"
        "  model_config:\n"
        "    hiddens: [8]\n",
    )
    track_dir = tmp_path / "track"
    rc = main(
        [
            "train",
            "-f",
            config,
            "--max-steps",
            "4",
            "--fused-steps",
            "2",
            "--track-dir",
            str(track_dir),
        ]
    )
    assert rc == 0
    metrics = (track_dir / "metrics.jsonl").read_text().strip().splitlines()
    assert len(metrics) == 4
    assert json.loads(metrics[-1])["algorithm/steps"] == 4


def test_import_reaches_unimported_submodules(tmp_path) -> None:
    """Dotted paths into packages whose submodules aren't eagerly
    imported must resolve (regression: `__import__` only loads the top
    package)."""
    import sys

    from rl8_tpu.trainers.config import _import

    pkg = tmp_path / "cfgpkg"
    (pkg / "sub").mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (pkg / "sub" / "__init__.py").write_text("")
    (pkg / "sub" / "mod.py").write_text("class Thing:\n    pass\n")
    sys.path.insert(0, str(tmp_path))
    try:
        for mod in list(sys.modules):
            if mod.startswith("cfgpkg"):
                del sys.modules[mod]
        thing = _import("cfgpkg.sub.mod.Thing")
        assert thing.__name__ == "Thing"
        with pytest.raises(ImportError):
            _import("cfgpkg.sub.mod.Missing")
        with pytest.raises(ImportError):
            _import("cfgpkg.nope.mod.Thing")
    finally:
        sys.path.remove(str(tmp_path))


def test_import_surfaces_nested_dependency_errors(tmp_path) -> None:
    """A ModuleNotFoundError raised from INSIDE a located module (a
    missing third-party dependency) must not be masked by the generic
    dotted-path ImportError."""
    import sys

    from rl8_tpu.trainers.config import _import

    pkg = tmp_path / "badpkg"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("import definitely_not_a_real_pkg\n")
    sys.path.insert(0, str(tmp_path))
    try:
        for mod in list(sys.modules):
            if mod.startswith("badpkg"):
                del sys.modules[mod]
        with pytest.raises(ModuleNotFoundError, match="definitely_not_a_real_pkg"):
            _import("badpkg.Thing")
    finally:
        sys.path.remove(str(tmp_path))


def test_from_file_rejects_empty_config(tmp_path) -> None:
    """An empty/non-mapping config file reports a clear error instead of
    a TypeError from `in None`."""
    import pytest

    from rl8_tpu import TrainConfig

    p = tmp_path / "empty.yaml"
    p.write_text("# just a comment\n")
    with pytest.raises(RuntimeError, match="mapping"):
        TrainConfig.from_file(p)


def test_optimizer_config_lr_alias_conflict_rejected() -> None:
    import pytest

    from rl8_tpu import AlgorithmConfig
    from rl8_tpu.env import DiscreteDummyEnv

    with pytest.raises(ValueError, match="only one of"):
        AlgorithmConfig(
            num_envs=8,
            horizon=4,
            model_config={"hiddens": (8,)},
            optimizer_config={"lr": 1e-3, "learning_rate": 3e-4},
        ).build(DiscreteDummyEnv)


def test_zero_minibatch_size_rejected() -> None:
    """An explicit sgd_minibatch_size=0 reaches hparam validation rather
    than silently selecting whole-buffer training."""
    import pytest

    from rl8_tpu import AlgorithmConfig
    from rl8_tpu.env import DiscreteDummyEnv

    with pytest.raises(ValueError):
        AlgorithmConfig(
            num_envs=8,
            horizon=4,
            sgd_minibatch_size=0,
            model_config={"hiddens": (8,)},
        ).build(DiscreteDummyEnv)


def test_cli_fused_steps_with_default_checkpoint_cadence(tmp_path) -> None:
    """--fused-steps with --checkpoint-dir and NO explicit
    --steps-per-checkpoint defaults the checkpoint cadence to the fused
    batch size instead of crashing on the divisibility check."""
    config = _write_yaml(
        tmp_path,
        "env_cls: rl8_tpu.env.DiscreteDummyEnv\n"
        "algorithm_config:\n"
        "  horizon: 4\n"
        "  num_envs: 8\n"
        "  model_config:\n"
        "    hiddens: [8]\n",
    )
    ckpt_dir = tmp_path / "ckpt"
    rc = main(
        [
            "train",
            "-f",
            config,
            "--max-steps",
            "4",
            "--fused-steps",
            "2",
            "--checkpoint-dir",
            str(ckpt_dir),
            "--track-dir",
            str(tmp_path / "track"),
        ]
    )
    assert rc == 0
    from rl8_tpu.checkpoint import checkpoint_exists

    assert checkpoint_exists(ckpt_dir)


def test_cli_checkpoint_flags_require_checkpoint_dir(tmp_path) -> None:
    """Checkpoint knobs without --checkpoint-dir error out loudly instead
    of being silently ignored."""
    config = _write_yaml(tmp_path, "env_cls: rl8_tpu.env.DiscreteDummyEnv\n")
    with pytest.raises(SystemExit):
        main(["train", "-f", config, "--async-checkpoints"])
    with pytest.raises(SystemExit):
        main(["train", "-f", config, "--steps-per-checkpoint", "2"])


def test_cli_doctor(tmp_path, capsys) -> None:
    """`doctor` reports devices/mesh/storage/config gates and exits 0
    when everything checks out, non-zero on a failing check."""
    config = _write_yaml(
        tmp_path,
        "env_cls: rl8_tpu.env.DiscreteDummyEnv\n"
        "algorithm_config:\n"
        "  horizon: 4\n"
        "  num_envs: 8\n"
        "  model_config:\n"
        "    hiddens: [8]\n",
    )
    rc = main(
        [
            "doctor",
            "-f",
            config,
            "--checkpoint-dir",
            str(tmp_path / "ckpt"),
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "checks passed" in out
    assert "execution mode: single-device" in out
    assert "writable" in out
    assert "fail:" not in out

    # A bad config fails the build check and flips the exit code.
    bad = tmp_path / "bad.yaml"
    bad.write_text("env_cls: not.a.real.Env\n")
    rc = main(["doctor", "-f", str(bad)])
    out = capsys.readouterr().out
    assert rc == 1
    assert "fail: config build failed" in out

    # An unwritable checkpoint destination fails the write probe.
    blocker = tmp_path / "blocker"
    blocker.write_text("")  # a FILE where a directory is needed
    rc = main(["doctor", "--checkpoint-dir", str(blocker / "sub")])
    out = capsys.readouterr().out
    assert rc == 1
    assert "fail:" in out and "write probe" in out
