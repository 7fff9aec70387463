"""Multi-process (DCN-layer) test: 2 local processes, jax.distributed.

The reference is single-chip; this framework's scaling layer (SURVEY.md
2g required equivalents) must work across hosts.  Real DCN hardware is
not available here, so this exercises the exact code path —
`multihost.initialize` -> jax.distributed -> `pod_mesh` -> the
digit-sharded rotation with its psum riding the cross-process axis — on
two local CPU processes with 4 virtual devices each.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_rotate():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "multihost_worker.py"),
             str(pid), "2", coord],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "OK" in out, out[-2000:]
