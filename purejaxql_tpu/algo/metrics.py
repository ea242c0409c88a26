"""Shared metric-aggregation kernels for the in-graph evaluators.

Every family's greedy eval ends by averaging info values over *finished*
episodes (the reference convention: ``nanmean(where(returned_episode, x,
nan))``, pqn_gymnax.py:396-406).  Under SPMD that naive form is shard-local:
each replica would report a mean over only its TEST_NUM_ENVS/n_shards eval
envs.  `episode_mean_metrics` keeps the single-chip path bit-identical to
the reference (so golden pins and the parity harness are untouched) and,
when `pmap_axis` is set, switches to a done-weighted GLOBAL mean via psum of
(masked sum, episode count) so every shard reports the same global eval
numbers — invariant to how the eval envs are partitioned across shards.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def episode_mean_metrics(
    infos: Dict[str, Any], pmap_axis: Optional[str] = None
) -> Dict[str, Any]:
    """Mean of each info leaf over steps where `returned_episode` is set.

    Args:
      infos: stacked info pytree from an eval rollout scan; must contain a
        boolean `returned_episode` leaf marking episode ends.
      pmap_axis: if set, aggregate globally over the named mesh axis.

    Returns:
      A pytree of scalars (NaN where no episode finished anywhere).
    """
    mask = infos["returned_episode"]
    if pmap_axis is None:
        return jax.tree_util.tree_map(
            lambda x: jnp.nanmean(jnp.where(mask, x, jnp.nan)), infos
        )
    maskf = mask.astype(jnp.float32)
    count = jax.lax.psum(maskf.sum(), pmap_axis)

    def _global_mean(x):
        s = jax.lax.psum((x.astype(jnp.float32) * maskf).sum(), pmap_axis)
        return jnp.where(count > 0, s / jnp.maximum(count, 1.0), jnp.nan)

    return jax.tree_util.tree_map(_global_mean, infos)


def apply_eval_subsample(config: Dict[str, Any]) -> Dict[str, Any]:
    """EVAL_SUBSAMPLE=k runs the in-graph eval with TEST_NUM_ENVS/k envs at
    unchanged cadence and horizon — an unbiased cut of the eval tax (fewer
    episode samples, same episode-length distribution). k=1 (default) keeps
    the reference eval exactly, preserving bitwise parity; the in-graph eval
    at reference cadence otherwise costs up to ~35% of wall-clock at MinAtar
    scale (TEST_NUM_ENVS=128 x TEST_NUM_STEPS=max-episode every 5% of
    updates, pqn_gymnax.py:333-343,364-406).

    Mutates and returns `config`; call before the test env is built.
    """
    sub = int(config.get("EVAL_SUBSAMPLE", 1))
    if sub > 1 and "TEST_NUM_ENVS" in config:
        config["TEST_NUM_ENVS"] = max(config["TEST_NUM_ENVS"] // sub, 1)
    return config


def test_interval_updates(config: Dict[str, Any]) -> int:
    """Number of updates between in-graph evals.

    The reference computes ``int(NUM_UPDATES * TEST_INTERVAL)``
    (pqn_gymnax.py:333-343); clamped to >=1 because short or segmented runs
    can make the product < 1, and a jitted ``n_updates % 0`` is an XLA
    remainder-by-zero with undefined results.
    """
    return max(1, int(config["NUM_UPDATES"] * config["TEST_INTERVAL"]))
