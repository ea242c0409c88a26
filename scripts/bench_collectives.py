"""Collective microbenchmark: the per-update pmean cost, isolated.

The SPMD trainer's ONLY cross-shard traffic is NUM_EPOCHS*NUM_MINIBATCHES
gradient pmeans of the parameter tree (+1 metrics pmean) per update
(parallel/spmd.py). This times exactly that collective — a pmean of the
real model's gradient-shaped tree — over k mesh shards, so the weak-scaling
artifact can separate "collective cost" from the CPU-mesh core-contention
that pollutes whole-program scaling numbers on a virtual mesh.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_collectives.py --alg pqn_cartpole
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
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.parallel.mesh import make_mesh


def _param_tree(config):
    from purejaxql_tpu.algo.pqn import build_env
    from purejaxql_tpu.models.factory import make_q_network

    _, _, base_env, env_params, _ = build_env(dict(config))
    obs_shape = base_env.observation_space(env_params).shape
    net = make_q_network(
        dict(config), base_env.action_space(env_params).n, obs_shape
    )
    return net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *obs_shape)), train=False
    )["params"]


def time_pmean(tree, k, iters=50):
    mesh = make_mesh(env=k, devices=jax.devices()[:k])

    @jax.jit
    def pmean_n(t):
        def body(t):
            # `iters` chained pmeans so per-call overhead dominates the
            # measurement, with a data dependence XLA cannot collapse
            for _ in range(iters):
                t = jax.lax.pmean(t, "env")
                t = jax.tree_util.tree_map(lambda x: x + 1.0, t)
            return t

        return shard_map(
            body, mesh=mesh, in_specs=P(), out_specs=P(),
            check_rep=False,
        )(t)

    out = pmean_n(tree)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # warmup
    times = []
    for _ in range(5):
        t0 = time.time()
        out = pmean_n(tree)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append(time.time() - t0)
    return min(times) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--alg", default="pqn_cartpole")
    args = p.parse_args()

    config = compose(alg=args.alg, overrides=["PARITY=strict"])
    tree = _param_tree(config)
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree)
    )
    grad_pmeans = config["NUM_EPOCHS"] * config["NUM_MINIBATCHES"]

    n = len(jax.devices())
    results = {
        "alg": args.alg,
        "backend": jax.default_backend(),
        "n_params": n_params,
        "grad_bytes": 4 * n_params,
        "grad_pmeans_per_update": grad_pmeans,
        "pmean_us": {},
        "collective_us_per_update": {},
    }
    for k in (c for c in (2, 4, 8) if c <= n):
        per = time_pmean(tree, k)
        results["pmean_us"][k] = round(1e6 * per, 1)
        results["collective_us_per_update"][k] = round(
            1e6 * per * (grad_pmeans + 1), 1
        )
        print(
            f"# {k} shards: pmean {1e6 * per:.1f} us -> "
            f"{1e6 * per * (grad_pmeans + 1):.1f} us/update",
            file=sys.stderr,
        )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
