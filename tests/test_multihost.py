"""Multi-host (multi-process) distributed sweep: two jax.distributed
processes over localhost run the SAME sharded BER sweep with psum riding the
cross-process collective, and must agree on the result."""
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


@pytest.mark.timeout(300)
def test_two_process_distributed_sweep():
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "multihost_worker.py")
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)   # 1 device per process

    procs = [subprocess.Popen([sys.executable, worker, str(i), "2", port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"WORKER_OK {i}" in out, out[-2000:]
    # both processes report the SAME psum-reduced BER
    v0 = [l for l in outs[0].splitlines() if l.startswith("WORKER_OK")][0]
    v1 = [l for l in outs[1].splitlines() if l.startswith("WORKER_OK")][0]
    assert v0.split()[2] == v1.split()[2]
