"""Where does rnn_cartpole time go? Time the full update vs a rollout-only
and learn-only variant on the real chip, at the bench config."""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.algo.pqn_rnn import make_train

N_UPDATES = 40


def run(tag, overrides):
    config = compose(
        alg="pqn_rnn_cartpole",
        overrides=[
            f"TOTAL_TIMESTEPS={32 * 64 * N_UPDATES}",
            "TOTAL_TIMESTEPS_DECAY=500000",
            "COLLECT_METRICS=False",
        ]
        + overrides,
    )
    train = jax.jit(make_train(dict(config)))
    rng = jax.random.PRNGKey(0)
    out = train(rng)  # warmup (compile + upload)
    np.asarray(jax.tree_util.tree_leaves(out["runner_state"][0].params)[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = train(rng)
        np.asarray(jax.tree_util.tree_leaves(out["runner_state"][0].params)[0])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    steps = 32 * 64 * N_UPDATES
    print(f"{tag}: {dt*1e3:.1f} ms  ({steps/dt/1e3:.1f}k steps/s)", flush=True)
    return dt


base = run("full (bench config)", [])
noeval = run("eval off", ["TEST_DURING_TRAINING=False"])
nolearn = run("eval off + learn off (epochs=0)", [
    "TEST_DURING_TRAINING=False", "NUM_EPOCHS=0",
])
lightlearn = run("eval off + 1 minibatch", [
    "TEST_DURING_TRAINING=False", "NUM_MINIBATCHES=1",
])
print(f"eval tax: {(base-noeval)*1e3:.1f} ms")
print(f"learn: {(noeval-nolearn)*1e3:.1f} ms, rollout+overhead: {nolearn*1e3:.1f} ms")
