"""Multi-host runtime smoke test: 2 real processes, DCN-style mesh.

Spawns two fresh Python processes (each with 2 virtual CPU devices), joins
them with ``initialize_distributed`` (the wrapper over
``jax.distributed.initialize``) and runs the leaf-sharded MRA sweep over a
``make_multihost_mesh`` — chains on the cross-process ("DCN") axis, tree
leaves on the within-process ("ICI") axis, exactly the placement documented
in pymra_tpu/parallel/mesh.py. The objective must match the single-device
value. This is the testable-locally stand-in for BASELINE.md's >=2-host
scaling north star; the reference's only cross-process story is the fork +
pickle Pipe (pyMRA/MRANode.py:64-116).
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_sweep():
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=repo_root,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "multihost MRA objective OK" in out, out[-3000:]
