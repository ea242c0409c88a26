"""SPMD training over a device mesh: envs shard along the "env" axis,
learner replicas stay in lockstep via psum'd gradients over ICI.

This is the scaling layer the reference lacks (SURVEY.md §5 "distributed
communication backend: absent"): the north-star layout is thousands of envs
sharded over the chips of a pod slice, each chip stepping its local env
shard inside the same fused update scan, with gradient/batch-stat
reductions riding ICI (BASELINE.json north_star).

Design: `jax.shard_map` over a Mesh axis; the shard body is the SAME fused
trainer as single-chip (`algo.pqn.make_train(pmap_axis=...)`), so the whole
multi-chip run is still one XLA program per device with collectives inserted
exactly where the algorithm needs them:
  - `pmean(grads)` once per minibatch (the only per-update collective),
  - `pmean` inside BatchNorm/BatchRenorm when NORM_TYPE uses batch stats,
  - `pmean(metrics)` once per update.
Rollout stepping, Q(lambda) scans, and minibatch shuffles are shard-local —
zero communication — so aggregate env-steps/s scales linearly in chips
until the (tiny) gradient reduction dominates.

Semantics note (documented divergence from single-chip bitwise parity):
per-shard env streams derive from `fold_in(rng, axis_index)` and minibatch
shuffles are shard-local, so a k-shard run is a different (equally valid)
sample of the same algorithm, like changing NUM_ENVS partitioning. Learner
updates use the full global batch via gradient pmean. OptimisticResetVecEnv
reset pools are likewise per-shard (num_envs_local / reset_ratio fresh
resets per shard per step) — the global reset budget is identical, shared
only within a shard (SURVEY.md §7 "OptimisticReset under sharding").
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from purejaxql_tpu.algo import pqn
from purejaxql_tpu.utils.logging import MetricLogger


def make_train_spmd(
    config: Dict[str, Any],
    mesh: Mesh,
    axis_name: str = "env",
    logger: Optional[MetricLogger] = None,
    make_train: Callable = pqn.make_train,
) -> Callable:
    """Build `train(rng) -> {"train_state", "metrics"}` sharded over
    `mesh[axis_name]`. NUM_ENVS / TEST_NUM_ENVS in `config` are GLOBAL and
    must divide by the axis size; the returned callable takes one rng
    (replicated) and returns replicated outputs.
    """
    n_shards = mesh.shape[axis_name]
    assert config["NUM_ENVS"] % n_shards == 0, (
        f"NUM_ENVS={config['NUM_ENVS']} not divisible by {n_shards} shards"
    )

    local = dict(config)
    local["NUM_ENVS"] = config["NUM_ENVS"] // n_shards
    if "TEST_NUM_ENVS" in config:
        local["TEST_NUM_ENVS"] = max(config["TEST_NUM_ENVS"] // n_shards, 1)
    # Keep the global update count: the local trainer derives NUM_UPDATES
    # from TOTAL_TIMESTEPS // NUM_STEPS // NUM_ENVS(local).
    local["TOTAL_TIMESTEPS"] = int(float(config["TOTAL_TIMESTEPS"])) // n_shards
    local["TOTAL_TIMESTEPS_DECAY"] = (
        int(float(config.get("TOTAL_TIMESTEPS_DECAY", config["TOTAL_TIMESTEPS"])))
        // n_shards
    )
    # Report global env-steps in the timesteps counter.
    local["TIMESTEP_SCALE"] = n_shards

    train = make_train(local, logger=logger, pmap_axis=axis_name)

    def shard_body(rng):
        out = train(rng)
        # Return only replicated values: final train_state (lockstep across
        # shards by construction) and pmean'd metrics.
        train_state = out["runner_state"][0]
        return {"train_state": train_state, "metrics": out["metrics"]}

    spmd = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=P(),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(spmd)
