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


def make_train_gspmd(
    config: Dict[str, Any],
    mesh: Mesh,
    axis_name: str = "env",
    logger: Optional[MetricLogger] = None,
    make_train: Callable = pqn.make_train,
) -> Callable:
    """The jit-sharding (GSPMD) alternative to `make_train_spmd`: ONE
    global program at global NUM_ENVS, with a `with_sharding_constraint`
    pinning the env-batch exploration state to `P(axis_name)`; XLA's
    partitioner propagates shardings through the fused scan and inserts
    the collectives itself (the "annotate + let XLA shard" recipe).

    Semantics: unlike shard_map SPMD (per-shard rng streams, shard-local
    minibatch shuffles — a *different sample* of the algorithm), this is
    the SAME program as single-chip, merely partitioned — results match
    the unsharded trainer up to float reduction order (see
    tests/test_spmd.py::test_gspmd_matches_single_device). The trade: the
    global minibatch shuffle becomes a cross-chip all-to-all each epoch,
    where shard_map pays only one gradient pmean — so shard_map is the
    production path and this is the parity/verification path. Both are
    kept per the comparison recipe in BASELINE.json's north star.
    """
    from jax.sharding import NamedSharding

    n_shards = mesh.shape[axis_name]
    assert config["NUM_ENVS"] % n_shards == 0, (
        f"NUM_ENVS={config['NUM_ENVS']} not divisible by {n_shards} shards"
    )
    n_envs = int(config["NUM_ENVS"])

    def shard_hint(tree):
        def pin(x):
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == n_envs:
                spec = P(axis_name, *([None] * (x.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, spec)
                )
            return x

        return jax.tree_util.tree_map(pin, tree)

    train = make_train(config, logger=logger, shard_hint=shard_hint)

    def body(rng):
        out = train(rng)
        return {
            "train_state": out["runner_state"][0],
            "metrics": out["metrics"],
        }

    return jax.jit(body)


def make_train_spmd_seeds(
    config: Dict[str, Any],
    mesh: Mesh,
    seed_axis: str = "seed",
    env_axis: str = "env",
    logger: Optional[MetricLogger] = None,
    make_train: Callable = pqn.make_train,
) -> Callable:
    """Two-axis SPMD: independent seeds along `seed_axis`, env-sharded
    data parallelism along `env_axis` — the full (seed, env) mesh from
    parallel/mesh.py actually wired up.

    Each seed row is an isolated experiment (its rng is the caller's rng
    folded with the seed index; NO collective crosses the seed axis);
    within a row, envs shard over `env_axis` with gradient/batch-stat
    pmean exactly like `make_train_spmd`. Returns
    ``{"train_state", "metrics"}`` with a leading per-seed axis — the
    multi-chip analogue of the reference's ``jit(vmap(train))`` seed
    harness (pqn_gymnax.py:451).
    """
    n_env = mesh.shape[env_axis]
    n_seed = mesh.shape[seed_axis]
    assert config["NUM_ENVS"] % n_env == 0
    local = dict(config)
    local["NUM_ENVS"] = config["NUM_ENVS"] // n_env
    if "TEST_NUM_ENVS" in config:
        local["TEST_NUM_ENVS"] = max(config["TEST_NUM_ENVS"] // n_env, 1)
    local["TOTAL_TIMESTEPS"] = int(float(config["TOTAL_TIMESTEPS"])) // n_env
    local["TOTAL_TIMESTEPS_DECAY"] = (
        int(float(config.get("TOTAL_TIMESTEPS_DECAY", config["TOTAL_TIMESTEPS"])))
        // n_env
    )
    local["TIMESTEP_SCALE"] = n_env

    train = make_train(local, logger=logger, pmap_axis=env_axis)

    def shard_body(rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(seed_axis))
        out = train(rng)
        train_state = out["runner_state"][0]
        # add the per-seed leading axis the out_specs concatenate over
        expand = lambda t: jax.tree_util.tree_map(lambda x: x[None], t)
        return {
            "train_state": expand(train_state),
            "metrics": expand(out["metrics"]),
        }

    spmd = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=P(),
        out_specs={"train_state": P(seed_axis), "metrics": P(seed_axis)},
        check_vma=False,
    )
    del n_seed
    return jax.jit(spmd)


def make_train_spmd_resumable(
    config: Dict[str, Any],
    mesh: Mesh,
    axis_name: str = "env",
    logger: Optional[MetricLogger] = None,
    make_train: Callable = pqn.make_train,
) -> Callable:
    """Like `make_train_spmd`, but the returned callable ALSO accepts and
    returns the full sharded runner_state, so segmented continuation
    (algo/segmented.py) composes with SPMD: 1e9-step configs can stream
    metrics/checkpoints at segment boundaries while envs stay sharded over
    the mesh.

    Sharding of the carried state (FF-PQN runner_state layout
    ``(train_state, expl_state, test_metrics, rng)``):
      - train_state: replicated (learner replicas are lockstep),
      - expl_state (obs + env states): sharded along `axis_name` (axis 0 is
        the env batch),
      - test_metrics: replicated (globally aggregated, algo/metrics.py),
      - rng: sharded — each shard's decorrelated stream round-trips
        through the continuation exactly.

    Call as ``fn(rng)`` for the first segment and ``fn(rng, runner_state)``
    (same rng; it only feeds the discarded re-init) for continuations.
    """
    n_shards = mesh.shape[axis_name]
    assert config["NUM_ENVS"] % n_shards == 0
    local = dict(config)
    local["NUM_ENVS"] = config["NUM_ENVS"] // n_shards
    if "TEST_NUM_ENVS" in config:
        local["TEST_NUM_ENVS"] = max(config["TEST_NUM_ENVS"] // n_shards, 1)
    local["TOTAL_TIMESTEPS"] = int(float(config["TOTAL_TIMESTEPS"])) // n_shards
    local["TOTAL_TIMESTEPS_DECAY"] = (
        int(float(config.get("TOTAL_TIMESTEPS_DECAY", config["TOTAL_TIMESTEPS"])))
        // n_shards
    )
    local["TIMESTEP_SCALE"] = n_shards

    train = make_train(local, logger=logger, pmap_axis=axis_name)
    runner_specs = (P(), P(axis_name), P(), P(axis_name))
    out_specs = {
        "runner_state": runner_specs,
        "metrics": P(),
    }

    def body_first(rng):
        out = train(rng)
        return {"runner_state": out["runner_state"], "metrics": out["metrics"]}

    def body_cont(rng, runner_state):
        out = train(rng, runner_state)
        return {"runner_state": out["runner_state"], "metrics": out["metrics"]}

    first = jax.jit(
        jax.shard_map(
            body_first, mesh=mesh, in_specs=P(), out_specs=out_specs,
            check_vma=False,
        )
    )
    cont = jax.jit(
        jax.shard_map(
            body_cont, mesh=mesh, in_specs=(P(), runner_specs),
            out_specs=out_specs, check_vma=False,
        )
    )

    def fn(rng, runner_state=None):
        if runner_state is None:
            return first(rng)
        return cont(rng, runner_state)

    return fn


def train_segmented_spmd(
    config: Dict[str, Any],
    mesh: Mesh,
    num_segments: int,
    rng: Optional[jax.Array] = None,
    axis_name: str = "env",
    logger: Optional[MetricLogger] = None,
    make_train: Callable = pqn.make_train,
    on_segment: Optional[Callable] = None,
):
    """Sharded segmented training: `num_segments` bounded fused executions
    over the mesh with the full sharded runner_state carried across — the
    SPMD composition of algo/segmented.train_segmented. Bit-identical to
    one fused sharded run (same carried-rng argument as single-chip,
    tests/test_spmd.py::test_spmd_segmented_bitwise_equals_fused)."""
    import numpy as np

    config = dict(config)
    total = int(float(config["TOTAL_TIMESTEPS"]))
    config["TOTAL_TIMESTEPS_DECAY"] = int(
        float(config.get("TOTAL_TIMESTEPS_DECAY", total))
    )
    assert total % num_segments == 0, "num_segments must divide TOTAL_TIMESTEPS"
    seg_config = dict(config)
    seg_config["TOTAL_TIMESTEPS"] = total // num_segments

    rng = jax.random.PRNGKey(config.get("SEED", 0)) if rng is None else rng
    fn = make_train_spmd_resumable(
        seg_config, mesh, axis_name=axis_name, logger=logger,
        make_train=make_train,
    )

    runner_state = None
    all_metrics = []
    for seg in range(num_segments):
        outs = fn(rng, runner_state)
        runner_state = outs["runner_state"]
        np.asarray(runner_state[0].timesteps)  # real sync point
        all_metrics.append(outs["metrics"])
        if on_segment is not None:
            on_segment(seg, runner_state, outs["metrics"])
        if logger is not None and not config.get("LOG_VIA_CALLBACK", False):
            logger.log_history(outs["metrics"])

    metrics = jax.tree_util.tree_map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0),
        *all_metrics,
    ) if all_metrics and all_metrics[0] else {}
    return {"runner_state": runner_state, "metrics": metrics}
