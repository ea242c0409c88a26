"""Multi-chip scaling benchmark: aggregate env-steps/s vs shard count.

Measures the SPMD trainer (envs sharded over the mesh "env" axis, learner
replicas in lockstep via pmean over ICI) in weak scaling: per-shard env
count is held at the single-chip config's NUM_ENVS, so k shards run k x
the envs. The BASELINE.json target (>= 8x aggregate env-steps/s at 2 hosts
vs 1 chip) is this measurement on real pod hardware.

On a single-host/virtual mesh this validates the program and the scaling
SHAPE (collective overhead per update), not ICI bandwidth:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_multichip.py --alg pqn_cartpole

On a pod slice, run under your multi-host launcher; jax.distributed is
initialized automatically when coordinator env vars are present.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from purejaxql_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import numpy as np

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.parallel.mesh import init_distributed, make_mesh
from purejaxql_tpu.parallel.spmd import make_train_spmd


def measure(config, mesh, total_steps):
    fn = make_train_spmd(config, mesh)
    out = fn(jax.random.PRNGKey(0))
    np.asarray(out["train_state"].timesteps)  # warmup + force
    times = []
    for _ in range(3):
        t0 = time.time()
        out = fn(jax.random.PRNGKey(0))
        np.asarray(out["train_state"].timesteps)
        times.append(time.time() - t0)
    return total_steps / min(times)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--alg", default="pqn_cartpole")
    p.add_argument("--total-steps", type=int, default=262144)
    p.add_argument("--envs-per-shard", type=int, default=32)
    args = p.parse_args()

    init_distributed()
    n = len(jax.devices())
    shard_counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n]

    results = {}
    base_sps = None
    for k in shard_counts:
        config = compose(
            alg=args.alg,
            overrides=[
                f"NUM_ENVS={args.envs_per_shard * k}",
                f"TOTAL_TIMESTEPS={args.total_steps * k}",
                f"TOTAL_TIMESTEPS_DECAY={args.total_steps * k}",
                "TEST_DURING_TRAINING=False",
                "COLLECT_METRICS=False",
            ],
        )
        mesh = make_mesh(env=k, devices=jax.devices()[:k])
        sps = measure(config, mesh, args.total_steps * k)
        base_sps = base_sps or sps
        results[k] = {
            "aggregate_steps_per_s": round(sps),
            "scaling_vs_1shard": round(sps / base_sps, 2),
        }
        print(f"# {k} shards: {sps:,.0f} steps/s "
              f"({sps / base_sps:.2f}x)", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
