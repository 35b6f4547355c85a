"""2-process CPU `jax.distributed` rehearsal of the multi-host (DCN) story.

The single-host story is covered by tests/test_sharding.py (8 virtual
devices, one process) and the driver's `dryrun_multichip`. This test spawns
TWO OS processes that join one gloo-backed distributed runtime and run the
frame-sharded pipeline over an 8-device mesh spanning both — the topology a
multi-host TPU pod presents, with gloo standing in for DCN. Each worker
asserts bit-equality of its local shards against a single-device run and a
cross-process all-reduce; see tests/distributed_worker.py.

Reference scope: the reference is single-process (SURVEY.md §2.7) — this is
TPU-native scaling the reference has no counterpart for.
"""
import os
import socket
import subprocess
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_pipeline(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs, outs = [], []
    for pid in range(2):
        out_file = tmp_path / f"worker{pid}.ok"
        outs.append(out_file)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "distributed_worker.py"),
             str(pid), "2", str(port), str(out_file)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    logs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=600)
            logs.append(stdout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out_file) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"worker {pid} failed (rc={p.returncode}):\n{logs[pid]}"
        assert out_file.read_text() == "OK", f"worker {pid}:\n{logs[pid]}"
