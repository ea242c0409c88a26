"""Multi-chip scaling benchmark: aggregate env-steps/s vs shard count.

Measures the SPMD trainer (envs sharded over the mesh "env" axis, learner
replicas in lockstep via pmean over ICI) in weak scaling: per-shard env
count is held at the single-chip config's NUM_ENVS, so k shards run k x
the envs and NUM_UPDATES stays constant — the per-update wall-time delta
vs the 1-shard run IS the partition + collective overhead. The
BASELINE.json target (>= 8x aggregate env-steps/s at 2 hosts vs 1 chip)
is this measurement on real pod hardware.

On a single-host/virtual mesh this validates the program and the scaling
SHAPE (collective overhead per update), not ICI bandwidth — the emitted
`ici_roofline` block carries the bandwidth argument for real hardware:
the only cross-shard traffic per update is NUM_EPOCHS*NUM_MINIBATCHES
gradient pmeans (+1 metrics pmean) of the parameter tree, so projected
overhead on a v5e ICI is microseconds against per-update compute of
milliseconds.

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

# public spec: per-chip ICI bandwidth (bytes/s, all links combined).
_ICI_BYTES_PER_S = {
    "TPU v5 lite": 200e9,  # 1600 Gbps/chip
    "TPU v5e": 200e9,
    "TPU v4": 300e9,
    "TPU v5": 450e9,
}


def _count_params(config):
    from purejaxql_tpu.algo.pqn import build_env
    from purejaxql_tpu.models.factory import make_q_network

    import jax.numpy as jnp

    _, _, base_env, env_params, _ = build_env(dict(config))
    obs_shape = base_env.observation_space(env_params).shape
    net = make_q_network(
        dict(config), base_env.action_space(env_params).n, obs_shape
    )
    tree = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *obs_shape)), train=False)
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree["params"]))


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
    return total_steps / min(times), min(times)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--alg", default="pqn_cartpole")
    p.add_argument("--total-steps", type=int, default=262144)
    p.add_argument("--envs-per-shard", type=int, default=32)
    p.add_argument(
        "--extra", nargs="*", default=[], help="extra KEY=val overrides"
    )
    args = p.parse_args()

    init_distributed()
    n = len(jax.devices())
    shard_counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n]

    results = {
        "alg": args.alg,
        "mode": "weak_scaling (constant envs/shard, constant NUM_UPDATES)",
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "envs_per_shard": args.envs_per_shard,
        "shards": {},
    }
    base_sps = None
    base_time = None
    num_updates = None
    for k in shard_counts:
        config = compose(
            alg=args.alg,
            overrides=[
                f"NUM_ENVS={args.envs_per_shard * k}",
                f"TOTAL_TIMESTEPS={args.total_steps * k}",
                f"TOTAL_TIMESTEPS_DECAY={args.total_steps * k}",
                "TEST_DURING_TRAINING=False",
                "COLLECT_METRICS=False",
            ]
            + list(args.extra),
        )
        mesh = make_mesh(env=k, devices=jax.devices()[:k])
        sps, wall = measure(config, mesh, args.total_steps * k)
        if num_updates is None:
            num_updates = args.total_steps // (
                config["NUM_STEPS"] * args.envs_per_shard
            )
            n_params = _count_params(config)
            grad_pmeans_per_update = (
                config["NUM_EPOCHS"] * config["NUM_MINIBATCHES"]
            )
        base_sps = base_sps or sps
        base_time = base_time or wall
        row = {
            "aggregate_steps_per_s": round(sps),
            "scaling_vs_1shard": round(sps / base_sps, 2),
            "efficiency": round(sps / (base_sps * k), 3),
            "wall_s": round(wall, 3),
            "per_update_ms": round(1e3 * wall / num_updates, 3),
            # weak scaling with constant NUM_UPDATES: the wall-time delta
            # vs 1 shard is pure partition/collective overhead
            "collective_overhead_ms_per_update": round(
                1e3 * (wall - base_time) / num_updates, 3
            ),
        }
        results["shards"][k] = row
        print(
            f"# {k} shards: {sps:,.0f} steps/s ({sps / base_sps:.2f}x, "
            f"eff {row['efficiency']:.2f}, "
            f"+{row['collective_overhead_ms_per_update']:.2f} ms/update)",
            file=sys.stderr,
        )

    # ICI roofline for real pod hardware: bytes pmean'd per update
    grad_bytes = 4 * n_params  # f32 grads
    per_update_collective_bytes = grad_bytes * (grad_pmeans_per_update + 1)
    roofline = {
        "n_params": n_params,
        "grad_pmeans_per_update": grad_pmeans_per_update,
        "collective_bytes_per_update": per_update_collective_bytes,
        "note": (
            "ring all-reduce moves ~2x the payload per chip; projected "
            "per-update ICI time = 2 * bytes / per-chip ICI bandwidth. "
            "Rollout stepping, lambda-return scans and minibatch shuffles "
            "are shard-local (zero traffic), so the >=8x@2-hosts target "
            "holds as long as this projection stays small against "
            "per_update_ms."
        ),
    }
    for kind, bw in _ICI_BYTES_PER_S.items():
        roofline[f"projected_us_per_update[{kind}]"] = round(
            1e6 * 2 * per_update_collective_bytes / bw, 1
        )
    results["ici_roofline"] = roofline

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
