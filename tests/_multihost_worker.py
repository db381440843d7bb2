"""Worker for the 2-process multi-host test (``test_multihost.py``).

Each process owns 4 virtual CPU devices; ``jax.distributed`` joins them
into one 8-device mesh spanning both processes — the JAX-idiomatic stand
-in for a 2-host TPU slice. Run as::

    python _multihost_worker.py <proc_id> <port> <tmpdir> <repo_root>
"""

import json
import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    tmpdir = sys.argv[3]
    repo_root = sys.argv[4]
    sys.path.insert(0, repo_root)

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")

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

    from rl8_tpu import AlgorithmConfig, Trainer
    from rl8_tpu.env import DiscreteDummyEnv
    from rl8_tpu.trainers.tracking import JsonlRun

    mesh = create_mesh()
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
    trainer = Trainer(algorithm, run=JsonlRun(os.path.join(tmpdir, "track")))

    trainer.step()
    trainer.step()

    ckpt_dir = os.path.join(tmpdir, "ckpt")
    trainer.save_checkpoint(ckpt_dir)
    trainer.restore_checkpoint(ckpt_dir)

    stats = trainer.step()
    result = {
        "losses/total": float(stats["losses/total"]),
        "returns/mean": float(stats["returns/mean"]),
        "env/steps": int(stats["env/steps"]),
        "algorithm/steps": int(stats["algorithm/steps"]),
    }
    with open(os.path.join(tmpdir, f"result_{proc_id}.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
