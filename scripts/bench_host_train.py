"""End-to-end host-path training throughput (CPU backend).

The host path (pqn_host: C++ pool + io_callback in-graph stepping) needs
host-callback support, which the tunneled axon TPU runtime lacks — so
bench.py shells out to this script with JAX_PLATFORMS=cpu and records the
result as the EnvPool-role END-TO-END number (complementing the raw-pool
stepping row). Prints one JSON line {"steps_per_s": ...}.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from purejaxql_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import numpy as np

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.algo.pqn_host import make_train, make_train_async

ENV_NAME = sys.argv[1] if len(sys.argv) > 1 else "PongRam-EH"
TOTAL = int(sys.argv[2]) if len(sys.argv) > 2 else 262144

OVERRIDES = [
    f"ENV_NAME={ENV_NAME}",
    f"TOTAL_TIMESTEPS={TOTAL}",
    f"TOTAL_TIMESTEPS_DECAY={TOTAL}",
    "NUM_ENVS=64",
    "NUM_STEPS=32",
    "NUM_MINIBATCHES=8",
    "NUM_EPOCHS=2",
    "HIDDEN_SIZE=128",
    "TEST_ENVS=8",
    "COLLECT_METRICS=False",
]

config = compose(alg="pqn_host_minatar", overrides=OVERRIDES)
fn = jax.jit(make_train(dict(config)))
out = jax.block_until_ready(fn(jax.random.PRNGKey(0)))  # compile + warmup
times = []
for _ in range(2):
    t0 = time.time()
    out = jax.block_until_ready(fn(jax.random.PRNGKey(0)))
    times.append(time.time() - t0)
sync_sps = TOTAL / min(times)

# lag-1 pipelined trainer (ASYNC_ENVS): host env stepping overlaps the
# device learn phase. Separate pools (stateful envs).
afn = make_train_async(dict(config))
out = afn(jax.random.PRNGKey(0))  # compile + warmup pass
times = []
for _ in range(2):
    t0 = time.time()
    out = afn(jax.random.PRNGKey(0))
    times.append(time.time() - t0)
async_sps = TOTAL / min(times)

print(json.dumps({
    "steps_per_s": sync_sps,
    "async_steps_per_s": async_sps,
    "async_over_sync": round(async_sps / sync_sps, 2),
    "env": ENV_NAME,
}))
