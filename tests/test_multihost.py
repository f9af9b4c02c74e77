"""Multi-host proof: two CPU processes (2 virtual devices each) join a
jax.distributed process group and drive the sharded batch solver and the
tree-sharded MIQP across the process boundary (SURVEY.md §7 stage 6:
host-count-agnostic wiring — demonstrated, not just designed)."""
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


def test_two_process_sharded_solve():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)   # worker pins cpu via jax.config
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out, f"proc {pid} output:\n{out}"
