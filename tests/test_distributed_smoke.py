"""2-process `jax.distributed` smoke of the training CLI (VERDICT r2 #9b).

The reference exercises its multi-process path only by launching real
multi-GPU jobs (engine/base_trainer.py:63-86); here two CPU processes with
one virtual device each form a 2-device global mesh, run one tiny synthetic
epoch through tools/trainval.py --distributed, and must both exit 0 with a
checkpoint written by process 0 only.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_trainval(tmp_path):
    port = _free_port()
    out = tmp_path / "run"
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            PYTHONPATH=REPO,
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(REPO, "tools", "trainval.py"),
                    "--distributed",
                    "--coordinator", f"localhost:{port}",
                    "--num_processes", "2",
                    "--process_id", str(pid),
                    "--tiny", "--synthetic",
                    "--synthetic_pairs", "4",
                    "--max_epoch", "1",
                    "--val_pairs", "2",
                    "--log_steps", "1",
                    "--output_dir", str(out),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for pid, (p, stdout) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {pid} failed:\n{stdout[-4000:]}"
    # process-0-only checkpointing (engine/checkpoint.py)
    assert (out / "snapshot.msgpack").exists()
    log = (out / "train.log").read_text()
    assert "devices=2" in log, log[-2000:]
    assert "checkpointed" in log
