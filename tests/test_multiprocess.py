"""2-process jax.distributed test (localhost coordinator, CPU backend).

The reference has no multi-host code at all (SURVEY.md §5 "distributed
communication backend: absent"); this validates the net-new layer's
multi-PROCESS behavior, which the 8-device single-process mesh suite
cannot: cluster join via init_distributed's env-var path, global-mesh
collectives crossing a process boundary (Gloo), learner-replica lockstep
across hosts, is_main_process gating of logging sinks.

Runs in subprocesses with their own device topology (4 virtual CPU
devices per process -> 8 global), independent of this process's mesh.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_training_lockstep():
    coord = f"localhost:{_free_port()}"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")
    }
    env["PYTHONPATH"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), coord],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
        rows = [
            json.loads(line.split("RESULT ", 1)[1])
            for line in stdout.splitlines()
            if line.startswith("RESULT ")
        ]
        assert len(rows) == 1, stdout
        outs.append(rows[0])

    a, b = sorted(outs, key=lambda r: r["proc"])
    assert a["proc"] == 0 and b["proc"] == 1
    # global step count, not per-process
    assert a["timesteps"] == 4096
    # learner replicas in lockstep ACROSS the process boundary: both
    # processes fetch identical replicated params
    assert a["param_checksum"] == b["param_checksum"]
    assert a["final_td_loss"] == b["final_td_loss"]
    assert np.isfinite(a["final_td_loss"])
