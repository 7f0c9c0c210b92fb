"""Two-process multi-host validation (VERDICT r1 #8).

Launches two real Python processes that `jax.distributed.initialize` against
a local TCP coordinator, build one global mesh (2 hosts x 2 virtual CPU
devices), run sharded train steps with per-host input shards, and checkpoint
through orbax from all processes — the runtime semantics of the reference's
16-rank Horovod deployment (`vgg_jpeg.sl:26-47`, `training.py:43-66`).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_and_checkpoint(tmp_path):
    port = _free_port()
    ckpt_dir = str(tmp_path / "ckpt")
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_PLATFORMS="cpu",
        )
        # The sitecustomize's TPU relay must not be registered in workers.
        env.pop("JPEG_DCT_PLATFORM", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, _WORKER, ckpt_dir],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    ok_lines = [
        line
        for out in outs
        for line in out.splitlines()
        if line.startswith("MULTIHOST_OK")
    ]
    assert len(ok_lines) == 2, outs
    losses = {line.split()[1] for line in ok_lines}
    assert len(losses) == 1, f"loss mismatch across hosts: {ok_lines}"
    primaries = sorted(line.split()[2] for line in ok_lines)
    assert primaries == ["0", "1"], ok_lines
