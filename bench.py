"""Benchmark driver: trains PQN end-to-end on the real chip and reports
env-steps/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (mttga/purejaxql on an NVIDIA A40) reports CartPole
training in "a few seconds" for 5e5 steps (README.md:25-27); we take 3 s
=> ~1.67e5 env-steps/s as the comparison point. vs_baseline is the ratio of
our measured aggregate env-steps/s over that.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.algo.pqn import make_train

REFERENCE_CARTPOLE_STEPS_PER_S = 5e5 / 3.0  # A40, README.md:25-27


def bench_cartpole():
    config = compose(
        alg="pqn_cartpole",
        overrides=["TEST_DURING_TRAINING=False", "COLLECT_METRICS=False"],
    )
    total_steps = int(float(config["TOTAL_TIMESTEPS"]))
    rngs = jax.random.split(jax.random.PRNGKey(0), config["NUM_SEEDS"])
    fn = jax.jit(jax.vmap(make_train(config)))

    # Warmup: compiles and (on tunneled TPU backends) triggers one-time
    # program upload; block by materializing a scalar on the host.
    outs = fn(rngs)
    np.asarray(outs["runner_state"][0].timesteps)

    times = []
    for _ in range(3):
        t0 = time.time()
        outs = fn(rngs)
        np.asarray(outs["runner_state"][0].timesteps)
        times.append(time.time() - t0)
    dt = min(times)
    return total_steps * config["NUM_SEEDS"] / dt


def main():
    steps_per_s = bench_cartpole()
    print(
        json.dumps(
            {
                "metric": "cartpole_env_steps_per_s_per_chip",
                "value": round(steps_per_s),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / REFERENCE_CARTPOLE_STEPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
