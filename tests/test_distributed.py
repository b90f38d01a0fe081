"""True multi-process distributed test: 2 processes x 4 virtual CPU devices
through `jax.distributed` — the pod-simulation the reference never had.
Both processes must compute identical loss and gradient norms on the
sharded render."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_gradients(tmp_path):
    here = os.path.dirname(__file__)
    worker = os.path.join(here, "distributed_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    outs = [tmp_path / f"out{i}.txt" for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON"))}
    env["PYTHONPATH"] = os.path.join(here, "..")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", coord, str(outs[i])],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)]
    results = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        results.append((p.returncode, stderr.decode()[-2000:]))
    for rc, err in results:
        assert rc == 0, f"worker failed:\n{err}"
    vals = [tuple(map(float, open(o).read().split())) for o in outs]
    assert vals[0] == pytest.approx(vals[1], rel=1e-6), vals
    loss, gnorm = vals[0]
    assert loss >= 0.0 and gnorm > 0.0
