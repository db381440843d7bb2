"""Worker for the 2-process multi-host tests (``test_multihost.py``).

Each process owns 4 virtual CPU devices; ``jax.distributed`` joins them
into one 8-device mesh spanning both processes — the JAX-idiomatic stand
-in for a 2-host TPU slice. Run as::

    python _multihost_worker.py <proc_id> <port> <tmpdir> <repo_root> [mode]

Modes:
    train (default): 3 trainer steps + checkpoint round trip.
    fault: save generation 1, then simulate a preemption — process 1
        dies between the ``checkpoint_begin`` and ``checkpoint_publish``
        barriers of the generation-2 save (exit 17), while process 0
        rides out the failed collective under a watchdog (exit 3 on
        hang, 0 when the failure surfaced as an exception).
    resume: restart after the fault — restore (must land on the last
        COMPLETE generation), train a step, save a fresh generation.
    preempt: SIGTERM lands on process 1 ONLY mid-``Trainer.run``; the
        preemption sync must make BOTH processes save a final collective
        checkpoint and return early.
    asyncckpt: two back-to-back async collective saves overlapped with
        training, then a restore of the newest generation.
    stale: process 1's ``latest.json`` reads are faked to return nothing
        (an NFS attribute cache lagging a just-published generation);
        the ``agree=True`` existence check, the restore, and the next
        save must all follow process 0's view instead of diverging.
    recurrent: 2 trainer steps of RECURRENT PPO over the 2-process mesh
        plus a checkpoint round trip — covers the recurrent state
        extras (``seqs``, per-env LSTM states) that the feedforward
        modes never shard.
"""

import json
import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    tmpdir = sys.argv[3]
    repo_root = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "train"
    sys.path.insert(0, repo_root)

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Share the suite's persistent compilation cache (tests/conftest.py):
    # every mode recompiles the same shapes, so warm runs skip the
    # multi-second XLA builds that dominate these tests.
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(repo_root, ".jax_cache_cpu")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

    from rl8_tpu.parallel import create_mesh, initialize_multihost, is_main_process

    initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=proc_id,
        cpu_collectives="gloo",
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, "mesh must span both processes"
    assert len(jax.local_devices()) == 4
    assert is_main_process() == (proc_id == 0)

    from rl8_tpu import (
        AlgorithmConfig,
        RecurrentAlgorithmConfig,
        Trainer,
    )
    from rl8_tpu.env import DiscreteDummyEnv
    from rl8_tpu.trainers.tracking import JsonlRun

    mesh = create_mesh()

    def _ff_trainer(track: str) -> Trainer:
        algorithm = AlgorithmConfig(
            num_envs=64,
            horizon=8,
            seed=7,
            sgd_minibatch_size=64,
            num_sgd_iters=2,
            mesh=mesh,
        ).build(DiscreteDummyEnv)
        # Every process passes a real tracking run pointed at the SAME
        # directory; host-0 gating must leave exactly one writer.
        return Trainer(algorithm, run=JsonlRun(os.path.join(tmpdir, track)))

    def _rec_trainer(track: str) -> Trainer:
        algorithm = RecurrentAlgorithmConfig(
            num_envs=64,
            horizon=8,
            seed=7,
            seq_len=2,
            seqs_per_state_reset=4,
            sgd_minibatch_size=64,
            num_sgd_iters=2,
            model_config={"hidden_size": 8},
            mesh=mesh,
        ).build(DiscreteDummyEnv)
        return Trainer(algorithm, run=JsonlRun(os.path.join(tmpdir, track)))

    def _train_phase(trainer: Trainer, ckpt: str, prefix: str, recurrent: bool) -> None:
        """3 trainer steps with a sync collective checkpoint round trip
        after step 2; identical-global-stats result file per process."""
        trainer.step()
        trainer.step()
        trainer.save_checkpoint(ckpt)
        trainer.restore_checkpoint(ckpt)
        stats = trainer.step()
        result = {
            "losses/total": float(stats["losses/total"]),
            "returns/mean": float(stats["returns/mean"]),
            "env/steps": int(stats["env/steps"]),
            "algorithm/steps": int(stats["algorithm/steps"]),
        }
        if recurrent:
            result["seqs"] = int(trainer.algorithm.state.seqs)
        with open(os.path.join(tmpdir, f"{prefix}_{proc_id}.json"), "w") as f:
            json.dump(result, f)

    def _async_phase(trainer: Trainer, ckpt: str) -> None:
        """Background (async) collective checkpointing: both processes
        save without blocking, train through the write, and the
        generations publish in order."""
        from rl8_tpu.checkpoint import wait_for_checkpoint

        trainer.step()
        trainer.save_checkpoint(ckpt, block=False)
        trainer.step()  # overlaps generation 1's background write
        trainer.save_checkpoint(ckpt, block=False)  # waits gen 1
        wait_for_checkpoint()
        trainer.restore_checkpoint(ckpt)
        result = {
            "algorithm/steps": int(trainer.state["algorithm/steps"]),
            "env/steps": int(trainer.state["env/steps"]),
        }
        with open(
            os.path.join(tmpdir, f"asyncckpt_result_{proc_id}.json"), "w"
        ) as f:
            json.dump(result, f)

    trainer = (_rec_trainer if mode == "recurrent" else _ff_trainer)("track")
    ckpt_dir = os.path.join(tmpdir, "ckpt")

    if mode in ("train", "recurrent"):
        _train_phase(
            trainer,
            ckpt_dir,
            "result" if mode == "train" else "recurrent_result",
            recurrent=(mode == "recurrent"),
        )
    elif mode == "combo":
        # The three benign scenarios in ONE 2-process session (the
        # process spawn + distributed init + compile costs dominate the
        # individual tests; in-process jit caching makes the repeats
        # nearly free): feedforward train/checkpoint round trip, async
        # checkpointing on a fresh trainer, recurrent train round trip.
        _train_phase(trainer, ckpt_dir, "result", recurrent=False)
        _async_phase(
            _ff_trainer("track_async"), os.path.join(tmpdir, "ckpt_async")
        )
        _train_phase(
            _rec_trainer("track_rec"),
            os.path.join(tmpdir, "ckpt_rec"),
            "recurrent_result",
            recurrent=True,
        )
    elif mode == "fault":
        import threading

        import rl8_tpu.checkpoint as ck

        trainer.step()
        trainer.save_checkpoint(ckpt_dir)  # generation 1, complete

        orig_barrier = ck._barrier

        def _preempting_barrier(name: str) -> None:
            orig_barrier(name)
            if name == "checkpoint_begin" and proc_id == 1:
                os._exit(17)  # preempted after begin, before publish

        ck._barrier = _preempting_barrier
        trainer.step()
        if proc_id == 0:
            # The collective save can only fail with a dead peer; bound
            # how long we wait for that failure to surface.
            threading.Timer(75.0, lambda: os._exit(3)).start()
        status = "save_completed"
        try:
            trainer.save_checkpoint(ckpt_dir)  # generation 2: must NOT publish
        except BaseException as e:  # noqa: BLE001 — any failure is a valid preemption
            status = f"save_failed:{type(e).__name__}"
        with open(os.path.join(tmpdir, f"fault_result_{proc_id}.json"), "w") as f:
            json.dump({"status": status}, f)
        os._exit(0 if proc_id == 0 else 18)  # 18: process 1 outlived its kill
    elif mode == "asyncckpt":
        _async_phase(trainer, ckpt_dir)
    elif mode == "preempt":
        import signal

        from rl8_tpu.conditions import HitsUpperBound

        class _SigtermProc1:
            """Deliver SIGTERM to process 1 ONLY at step 2 — the sync in
            ``PreemptionMonitor.preempted`` must still checkpoint BOTH
            processes (the collective save deadlocks otherwise)."""

            def __call__(self, stats):
                if proc_id == 1 and stats["algorithm/steps"] == 2:
                    os.kill(os.getpid(), signal.SIGTERM)
                return False

        stats = trainer.run(
            stop_conditions=[
                _SigtermProc1(),
                HitsUpperBound("algorithm/steps", 12),
            ],
            checkpoint_dir=ckpt_dir,
        )
        result = {
            "algorithm/steps": int(stats["algorithm/steps"]),
            "env/steps": int(stats["env/steps"]),
        }
        with open(
            os.path.join(tmpdir, f"preempt_result_{proc_id}.json"), "w"
        ) as f:
            json.dump(result, f)
    elif mode == "stale":
        import rl8_tpu.checkpoint as ck
        from rl8_tpu.checkpoint import checkpoint_exists

        trainer.step()
        trainer.save_checkpoint(ckpt_dir)  # generation 1, complete

        if proc_id == 1:
            # Simulate a stale shared-mount attribute cache: this host
            # cannot see latest.json (or the legacy fallback) at all.
            ck._latest = lambda directory: None

        local = checkpoint_exists(ckpt_dir)  # differs across hosts
        agreed = checkpoint_exists(ckpt_dir, agree=True)  # must not
        # The stale host restores the generation process 0 names.
        trainer.restore_checkpoint(ckpt_dir)
        restored = dict(trainer.state)
        trainer.step()
        # The next save's index must also follow process 0 (a stale
        # local read would compute generation 1 again and collide).
        trainer.save_checkpoint(ckpt_dir)
        with open(os.path.join(tmpdir, f"stale_result_{proc_id}.json"), "w") as f:
            json.dump(
                {"local": local, "agreed": agreed, "restored": restored}, f
            )
    elif mode == "resume":
        trainer.restore_checkpoint(ckpt_dir)
        restored = dict(trainer.state)
        trainer.step()
        trainer.save_checkpoint(ckpt_dir)
        with open(os.path.join(tmpdir, f"resume_result_{proc_id}.json"), "w") as f:
            json.dump({"restored": restored, "after": dict(trainer.state)}, f)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
