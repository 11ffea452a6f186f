"""Multi-process jax.distributed smoke: 2 emulated hosts x 4 CPU devices
run the sharded processors over the GLOBAL 8-device mesh and must agree on
the result digest (collectives-correctness across the process boundary —
the multi-host story the reference never had, SURVEY.md §2.10 row 5)."""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "pysdr_tpu.parallel.distributed",
             "--coordinator", f"127.0.0.1:{port}", "--nprocs", "2",
             "--proc-id", str(pid), "--cpu-devices", "4",
             "--demo", "both", "--n-stream", "2"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed demo timed out")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    digests = {}
    for out in outs:
        for kind, d in re.findall(
                r"distributed (rx|chan|streaming) ok: .*digest=([0-9.]+)",
                out):
            digests.setdefault(kind, set()).add(d)
    assert {"rx", "chan", "streaming"} <= set(digests), outs
    # every process computed the same global result
    assert all(len(v) == 1 for v in digests.values()), digests
