"""Preemption-safe checkpointing (SIGTERM → resume).

The reference has no recovery story at all — a raw ``mp.spawn(join=True)``
where any rank crash kills the run (reference main_pretraining.py:285,
SURVEY §5 failure detection). On TPU VMs, maintenance events and batch
schedulers deliver SIGTERM; ``train.pretrain`` finishes the in-flight step,
writes a full resume checkpoint + a loop-position sidecar (epoch, best val
loss, rng key) and exits 0, and ``--resume true`` continues from the
interrupted epoch with the best-validation gate intact.
"""

import os
import signal
import subprocess
import sys
import threading

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from synergy_tpu.train import checkpoint as ckpt  # noqa: E402


def test_meta_sidecar_roundtrip(tmp_path):
    meta = {"epoch": 3, "min_loss": 1.25, "aug_key": [17, 4242]}
    ckpt.save_meta(str(tmp_path), "base_prompt", 120, meta)
    assert ckpt.load_meta(str(tmp_path), "base_prompt", 120) == meta
    assert ckpt.load_meta(str(tmp_path), "base_prompt", 121) is None
    # sidecar lives NEXT TO the Orbax step dir, never inside it
    assert os.path.exists(tmp_path / "base_prompt" / "meta_120.json")


_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from synergy_tpu.train.pretrain import main
main(["--tiny", "true", "--synthetic", "true", "--synthetic_size", "16",
      "--epochs", "40", "--steps_per_epoch", "2", "--batch_size", "8",
      "--accum_steps", "1", "--dtype", "float32",
      "--ckpt_dir", {ckpt_dir!r}])
"""


@pytest.mark.slow
def test_sigterm_writes_resume_checkpoint_then_resumes(tmp_path, capsys):
    ckpt_dir = str(tmp_path / "ck")
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c",
         _WORKER.format(repo=REPO, ckpt_dir=ckpt_dir)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    watchdog = threading.Timer(560, proc.kill)
    watchdog.start()
    lines = []
    try:
        # let it get past epoch 2 (so a best-val save exists), then SIGTERM
        for line in proc.stdout:
            lines.append(line)
            if "epoch 2/40" in line:
                proc.send_signal(signal.SIGTERM)
            if "preempted at epoch" in line:
                break
        rc = proc.wait(timeout=120)
        lines += proc.stdout.readlines()
    finally:
        watchdog.cancel()
        proc.kill()
    out = "".join(lines)
    assert rc == 0, out
    assert "SIGTERM: finishing in-flight step" in out, out
    assert "preempted at epoch" in out, out

    step = ckpt.latest_step(ckpt_dir, "base_prompt")
    assert step is not None
    meta = ckpt.load_meta(ckpt_dir, "base_prompt", step)
    assert meta is not None and meta["epoch"] >= 1
    assert "aug_key" in meta and meta["min_loss"] < float("inf")
    # the preempt save must NOT have overwritten the best-val tower export:
    # the export dir exists (from the best-val save) and predates the state
    export = os.path.join(ckpt_dir, "base_prompt", "export")
    assert os.path.isdir(export)

    # resume in-process (conftest already forces the CPU platform)
    from synergy_tpu.train.pretrain import main

    state = main(["--tiny", "true", "--synthetic", "true",
                  "--synthetic_size", "16", "--epochs", str(meta["epoch"] + 1),
                  "--steps_per_epoch", "2", "--batch_size", "8",
                  "--accum_steps", "1", "--dtype", "float32",
                  "--ckpt_dir", ckpt_dir, "--resume", "true"])
    resumed_out = capsys.readouterr().out
    assert f"resumed from step {step}" in resumed_out
    assert f"(epoch {meta['epoch']}," in resumed_out
    assert int(state.step) > step  # it actually trained further


_MP_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from synergy_tpu.train.pretrain import main
main(["--tiny", "true", "--synthetic", "true", "--synthetic_size", "16",
      "--epochs", "60", "--steps_per_epoch", "2", "--batch_size", "8",
      "--accum_steps", "1", "--dtype", "float32",
      "--ckpt_dir", {ckpt_dir!r}])
"""


@pytest.mark.slow
def test_sigterm_on_one_process_preempts_both(tmp_path):
    """Multi-process preemption agreement: a TPU-VM maintenance event may
    deliver SIGTERM to only SOME hosts. The per-step process_allgather in
    train.pretrain must propagate the flag so every process leaves the loop
    at the same step boundary (nobody blocks in the next collective), all
    join the collective resume checkpoint, and all exit 0."""
    import socket

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    ckpt_dir = str(tmp_path / "ck")
    worker = tmp_path / "mp_worker.py"
    worker.write_text(_MP_WORKER.format(repo=REPO, ckpt_dir=ckpt_dir))
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   COORDINATOR_ADDRESS=f"localhost:{port}",
                   NUM_PROCESSES="2", PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-u", str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    watchdogs = [threading.Timer(900, p.kill) for p in procs]
    for w in watchdogs:
        w.start()
    lines0 = []
    try:
        # SIGTERM ONLY process 0 once training is demonstrably under way
        for line in procs[0].stdout:
            lines0.append(line)
            if "epoch 2/60" in line:
                procs[0].send_signal(signal.SIGTERM)
            if "preempted at epoch" in line:
                break
        out0 = "".join(lines0) + procs[0].stdout.read()
        rc0 = procs[0].wait(timeout=300)
        out1 = procs[1].communicate(timeout=300)[0]
        rc1 = procs[1].returncode
    finally:
        for w in watchdogs:
            w.cancel()
        for p in procs:
            p.kill()
    assert rc0 == 0, out0
    assert rc1 == 0, out1
    assert "SIGTERM: finishing in-flight step" in out0, out0
    # the UNSIGNALED process agreed via the allgather and checkpointed too
    assert "SIGTERM" not in out1, out1
    assert "preempted at epoch" in out0, out0
    assert "preempted at epoch" in out1, out1

    step = ckpt.latest_step(ckpt_dir, "base_prompt")
    assert step is not None
    meta = ckpt.load_meta(ckpt_dir, "base_prompt", step)
    assert meta is not None and meta["epoch"] >= 1
