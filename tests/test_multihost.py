"""Multi-host execution path (SURVEY.md §2a): 2 real OS processes, each with
4 virtual CPU devices, joined by ``jax.distributed`` into one 8-device
process-spanning mesh; the full sharded train step (render -> loss -> grads
with the cross-process gradient all-reduce) must run and agree bit-for-bit
across processes. The reference abandoned its multi-process attempt
(/root/reference/README.md:129-136); this is the TPU-native replacement's
DCN-shaped code path, emulated on CPU (real multi-host TPU is not available
in CI)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.heavy
def test_two_process_train_step():
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append([ln for ln in out.splitlines()
                     if ln.startswith("RESULT")])
    assert outs[0] and outs[1]
    # identical global program => identical replicated results on every host
    assert outs[0][0] == outs[1][0], (outs[0][0], outs[1][0])
