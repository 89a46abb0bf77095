"""Multi-host rehearsal: the full train step over a 2-process CPU cluster.

The reference has no distributed backend at all (SURVEY.md §2: `--horovod`
parsed, never read); the TPU-native framework scales the env axis across
processes via jax.distributed + a global mesh (parallel/distributed.py).
This test spawns two real processes, each owning 4 virtual CPU devices, and
runs one full sharded training iteration; replicated params must agree.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training():
    port = _free_port()
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # worker sets its own cpu device count
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    sums = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("CHECKSUM")][0]
        sums.append(float(line.split()[2]))
    assert abs(sums[0] - sums[1]) < 1e-3, sums
