"""Profiling & throughput accounting — a first-class subsystem the
reference lacks (SURVEY.md §5: only coarse wall-clock timing exists,
pqn_gymnax.py:449-453, pqn_mujoco_playground.py:658-668).

- `trace(logdir)`: context manager around `jax.profiler` for device
  traces viewable in TensorBoard/XProf.
- `Throughput`: steps-per-second accounting between marks.
- `time_fn`: wall-time a jitted function properly (forces completion by
  materializing a leaf — `block_until_ready` is unreliable on tunneled
  TPU backends; warmup + min-of-k).
- `stage_timings`: per-stage breakdown using the staged API.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile: `with trace("/tmp/prof"): run()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force(tree) -> None:
    """Force completion of a computation by materializing every leaf."""
    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(leaf)


def time_fn(
    fn: Callable,
    *args,
    warmup: int = 1,
    iters: int = 3,
) -> Dict[str, float]:
    """Time fn(*args): returns {"best_s", "mean_s"} over `iters` after
    `warmup` runs. Forces completion via host materialization."""
    for _ in range(warmup):
        force(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.time()
        force(fn(*args))
        times.append(time.time() - t0)
    return {"best_s": min(times), "mean_s": sum(times) / len(times)}


class Throughput:
    """Env-steps/s accounting between marks (host-side)."""

    def __init__(self):
        self.t0 = time.time()
        self.last_t = self.t0
        self.last_steps = 0
        self.total_steps = 0

    def mark(self, total_env_steps: int) -> Dict[str, float]:
        now = time.time()
        dt = max(now - self.last_t, 1e-9)
        delta = total_env_steps - self.last_steps
        out = {
            "sps": delta / dt,
            "walltime": now - self.t0,
            "env_steps": total_env_steps,
        }
        self.last_t = now
        self.last_steps = total_env_steps
        self.total_steps = total_env_steps
        return out


def stage_timings(stages, rng: Optional[jax.Array] = None) -> Dict[str, float]:
    """Per-stage wall times for a PQNStages bundle (rollout / targets /
    learn / evaluate), each warmed up and timed separately. Pinpoints
    whether a config is env-bound or learner-bound.

    Each stage is timed through a jitted wrapper that reduces its outputs
    to one scalar on-device, so only compute (not device->host transfer of
    full rollouts) is measured — essential on tunneled TPU backends."""
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0) if rng is None else rng
    ts = stages.init_agent(rng)
    obs, env_state = stages.reset(rng)

    def reduced(fn):
        @jax.jit
        def wrapper(*args):
            out = fn(*args)
            leaves = [
                l.sum().astype(jnp.float32)
                for l in jax.tree_util.tree_leaves(out)
                if hasattr(l, "sum") and jnp.issubdtype(l.dtype, jnp.number)
            ]
            return sum(leaves)

        return wrapper

    out = {}
    out["rollout_s"] = time_fn(
        reduced(stages.rollout), ts, obs, env_state, rng
    )["best_s"]
    _, _, transitions, _ = stages.rollout(ts, obs, env_state, rng)
    out["targets_s"] = time_fn(
        reduced(stages.compute_targets), ts, transitions
    )["best_s"]
    targets = stages.compute_targets(ts, transitions)
    out["learn_s"] = time_fn(
        reduced(stages.learn), ts, transitions, targets, rng
    )["best_s"]
    if stages.config.get("TEST_DURING_TRAINING", False):
        out["evaluate_s"] = time_fn(reduced(stages.evaluate), ts, rng)["best_s"]
    return out
