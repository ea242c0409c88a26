"""Worker for test_multiprocess.py — NOT collected by pytest.

Joins a 2-process jax.distributed CPU cluster (4 local virtual devices per
process -> 8 global), verifies the multi-host hygiene surface
(init_distributed env-var path, is_main_process, process-gated logging),
then runs a REAL sharded PQN training over the global mesh and prints a
JSON line the parent compares across processes (learner replicas must
stay in lockstep across hosts, not just across a host's local devices).

Usage: python multiproc_worker.py <process_id> <coordinator_host:port>
"""

import json
import os
import sys

proc_id = int(sys.argv[1])
coord = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
# exercise init_distributed's cluster-env-var discovery path
os.environ["JAX_COORDINATOR_ADDRESS"] = coord
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(proc_id)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from purejaxql_tpu.parallel.mesh import (  # noqa: E402
    init_distributed,
    is_main_process,
    make_mesh,
)

init_distributed()  # must precede any backend use

import jax  # noqa: E402
import numpy as np  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4
assert is_main_process() == (proc_id == 0)

# process-gated logging: only process 0 owns sinks
from purejaxql_tpu.utils.logging import make_logger  # noqa: E402

lg = make_logger({"LOG_CONSOLE": True})
assert (len(lg.sinks) > 0) == (proc_id == 0), (proc_id, lg.sinks)
lg_all = make_logger({"LOG_CONSOLE": True, "LOG_ALL_PROCESSES": True})
assert len(lg_all.sinks) > 0

# real sharded training over the 2-host global mesh: the same
# make_train_spmd program the single-process suite runs 8-way, now with
# the "env" axis spanning a process (DCN/Gloo) boundary
from purejaxql_tpu.core.config import compose  # noqa: E402
from purejaxql_tpu.parallel.spmd import make_train_spmd  # noqa: E402

config = compose(
    alg="pqn_cartpole",
    overrides=[
        "TOTAL_TIMESTEPS=4096",
        "TOTAL_TIMESTEPS_DECAY=4096",
        "NUM_ENVS=16",
        "NUM_STEPS=16",
        "NUM_MINIBATCHES=2",
        "NUM_EPOCHS=1",
        "TEST_DURING_TRAINING=False",
        "HIDDEN_SIZE=32",
    ],
)
mesh = make_mesh(env=8)
out = jax.block_until_ready(
    make_train_spmd(config, mesh)(jax.random.PRNGKey(0))
)

ts = int(np.asarray(out["train_state"].timesteps))
leaves = jax.tree_util.tree_leaves(out["train_state"].params)
checksum = float(sum(np.abs(np.asarray(l)).sum() for l in leaves))
td = float(np.asarray(out["metrics"]["td_loss"])[-1])
print(
    "RESULT "
    + json.dumps(
        {
            "proc": proc_id,
            "timesteps": ts,
            "param_checksum": checksum,
            "final_td_loss": td,
        }
    ),
    flush=True,
)
