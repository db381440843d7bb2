"""Multi-host execution: 2 ``jax.distributed`` CPU processes.

Proves the multi-host path the reference lacks entirely (SURVEY.md
section 2.3's TPU-new mandate): a mesh spanning two processes trains
real steps with identical global stats on every host, checkpoints
collectively, and keeps single-writer metric/host-state semantics
(exactly one process logs, matching the reference's single process at
``/root/reference/src/rl8/trainers/_base.py:200``).
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import pytest

_WORKER = pathlib.Path(__file__).parent / "_multihost_worker.py"
_REPO_ROOT = str(pathlib.Path(__file__).parent.parent)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_pair(tmp_path, mode: None | str = None) -> None:
    """Spawn the 2-process worker pair and assert both exit cleanly."""
    port = _free_port()
    cmd_tail = [str(port), str(tmp_path), _REPO_ROOT] + (
        [mode] if mode else []
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(i), *cmd_tail],
            env=dict(os.environ),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"


@pytest.mark.slow
def test_two_process_training_async_and_recurrent_combo(tmp_path):
    """The three benign 2-process scenarios in ONE worker session (the
    spawn + jax.distributed init + compile overheads dominate them
    individually): feedforward training with a sync collective
    checkpoint round trip and single-writer tracking, async collective
    checkpointing, and recurrent training with globally-placed state
    extras."""
    _run_pair(tmp_path, "combo")

    # --- Feedforward train phase ---
    # Identical global stats on both hosts: every process computes the
    # same globally-reduced values from the same sharded state.
    with open(tmp_path / "result_0.json") as f:
        r0 = json.load(f)
    with open(tmp_path / "result_1.json") as f:
        r1 = json.load(f)
    assert r0 == r1
    assert r0["algorithm/steps"] == 3
    assert r0["env/steps"] == 3 * 64 * 8

    # Exactly ONE metrics writer: 3 trainer steps -> 3 records, not 6.
    with open(tmp_path / "track" / "metrics.jsonl") as f:
        records = [json.loads(line) for line in f]
    assert len(records) == 3
    assert records[-1]["algorithm/steps"] == 3

    # Exactly one params.json (written by process 0's log_params).
    with open(tmp_path / "track" / "params.json") as f:
        params = json.load(f)
    assert params["env_cls"] == "DiscreteDummyEnv"

    # The collective checkpoint produced both the orbax state tree and
    # the single-writer host-state file (versioned layout: latest.json
    # names the live generation).
    with open(tmp_path / "ckpt" / "latest.json") as f:
        latest = json.load(f)
    gen = tmp_path / "ckpt" / latest["checkpoint"]
    assert (gen / "state").is_dir()
    with open(gen / "host_state.json") as f:
        host = json.load(f)
    assert host["trainer_state"]["algorithm/steps"] == 2

    # --- Async checkpoint phase --- both processes save without
    # blocking, train through the write, the second save sequences
    # after the first, and restore lands on generation 2's counters.
    with open(tmp_path / "asyncckpt_result_0.json") as f:
        a0 = json.load(f)
    with open(tmp_path / "asyncckpt_result_1.json") as f:
        a1 = json.load(f)
    assert a0 == a1
    assert a0["algorithm/steps"] == 2  # generation 2's counters
    with open(tmp_path / "ckpt_async" / "latest.json") as f:
        assert json.load(f)["checkpoint"] == "ckpt-00000002"

    # --- Recurrent phase --- the recurrent state extras (`seqs`
    # counter, per-env LSTM states) must be globally placed (regression:
    # shard_state once hand-listed fields and silently left `seqs`
    # process-local), and stats agree on both hosts.
    with open(tmp_path / "recurrent_result_0.json") as f:
        rr0 = json.load(f)
    with open(tmp_path / "recurrent_result_1.json") as f:
        rr1 = json.load(f)
    assert rr0 == rr1
    assert rr0["algorithm/steps"] == 3
    # 3 steps x horizon 8 / seq_len 2 sequences transitioned.
    assert rr0["seqs"] == 12


@pytest.mark.slow
def test_multihost_preemption_checkpoints_both_processes(tmp_path):
    """SIGTERM delivered to ONE process must checkpoint BOTH: the
    monitor's all-gather syncs the flag at the next step boundary, both
    processes join the collective save, and both return early with
    identical counters (``rl8_tpu/preemption.py``)."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(_WORKER), str(i), str(port),
                str(tmp_path), _REPO_ROOT, "preempt",
            ],
            env=dict(os.environ),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"

    with open(tmp_path / "preempt_result_0.json") as f:
        r0 = json.load(f)
    with open(tmp_path / "preempt_result_1.json") as f:
        r1 = json.load(f)
    # Both processes stopped at the same early boundary (signal at step
    # 2, acted on after step 3) — far short of the 12-step stop bound.
    assert r0 == r1
    assert r0["algorithm/steps"] == 3

    # The final collective checkpoint carries the preemption-time
    # counters, so a rerun of the same command resumes from step 3.
    with open(tmp_path / "ckpt" / "latest.json") as f:
        latest = json.load(f)
    gen = tmp_path / "ckpt" / latest["checkpoint"]
    with open(gen / "host_state.json") as f:
        host = json.load(f)
    assert host["trainer_state"]["algorithm/steps"] == 3


@pytest.mark.slow
def test_multihost_checkpoint_fault_injection(tmp_path):
    """Kill one worker between the `checkpoint_begin` and
    `checkpoint_publish` barriers: the generation-2 save must NOT
    publish (latest.json keeps pointing at the last COMPLETE
    generation), and a full restart resumes from generation 1 and can
    checkpoint again — the crash-safety design claim of
    `rl8_tpu/checkpoint.py`, proven with real processes."""

    def _launch(mode):
        port = _free_port()
        return [
            subprocess.Popen(
                [
                    sys.executable, str(_WORKER), str(i), str(port),
                    str(tmp_path), _REPO_ROOT, mode,
                ],
                env=dict(os.environ),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
            for i in range(2)
        ]

    procs = _launch("fault")
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    # Process 1 was preempted between the barriers; process 0 either saw
    # the collective fail (0) or was reaped by its watchdog (3).
    assert procs[1].returncode == 17, f"worker 1:\n{outputs[1]}"
    assert procs[0].returncode in (0, 3), (
        f"worker 0 rc={procs[0].returncode}:\n{outputs[0]}"
    )

    # latest.json is untouched: it still names generation 1, the last
    # checkpoint whose publish barrier completed.
    with open(tmp_path / "ckpt" / "latest.json") as f:
        assert json.load(f)["checkpoint"] == "ckpt-00000001"
    from rl8_tpu.checkpoint import checkpoint_exists

    assert checkpoint_exists(tmp_path / "ckpt")

    # A restart (fresh 2-process launch) resumes from generation 1 and
    # checkpoints a fresh complete generation over the debris.
    procs = _launch("resume")
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"resume worker {i} failed:\n{out}"

    with open(tmp_path / "resume_result_0.json") as f:
        r0 = json.load(f)
    with open(tmp_path / "resume_result_1.json") as f:
        r1 = json.load(f)
    assert r0 == r1
    assert r0["restored"]["algorithm/steps"] == 1  # generation 1's counters
    assert r0["after"]["algorithm/steps"] == 2
    with open(tmp_path / "ckpt" / "latest.json") as f:
        assert json.load(f)["checkpoint"] == "ckpt-00000002"


@pytest.mark.slow
def test_multihost_stale_latest_view_follows_process_zero(tmp_path):
    """Fault-inject a stale shared-mount view on process 1 (its
    ``latest.json`` reads return nothing): the agreed existence check,
    the restore, and the NEXT save must all follow process 0's view —
    a per-host decision would split the job between mismatched
    collectives (``rl8_tpu/checkpoint.py`` ``_broadcast_index``)."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(_WORKER), str(i), str(port),
                str(tmp_path), _REPO_ROOT, "stale",
            ],
            env=dict(os.environ),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"

    with open(tmp_path / "stale_result_0.json") as f:
        r0 = json.load(f)
    with open(tmp_path / "stale_result_1.json") as f:
        r1 = json.load(f)
    # The staleness is real: the hosts' local reads DISAGREE...
    assert r0["local"] is True and r1["local"] is False
    # ...but the agreed answer and the restored counters match.
    assert r0["agreed"] is True and r1["agreed"] is True
    assert r0["restored"] == r1["restored"]
    assert r0["restored"]["algorithm/steps"] == 1
    # The post-restore save followed process 0's index: generation 2,
    # not a collision back onto generation 1.
    with open(tmp_path / "ckpt" / "latest.json") as f:
        assert json.load(f)["checkpoint"] == "ckpt-00000002"


