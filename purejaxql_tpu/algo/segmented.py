"""Segmented fused training: split one long run into bounded fused-program
executions with the runner_state carried across segments.

Why: (a) some TPU runtimes watchdog-kill device programs that execute for
minutes (1e9-step craftax configs run for hours as ONE program in the
reference design); (b) metrics stream to the host per segment instead of
accumulating in HBM for the whole run; (c) full training state can be
checkpointed at segment boundaries without the dispatch cost of the
stepwise host loop. Each segment is still a fully fused
scan-over-updates — per-segment dispatch overhead is one program launch.

Schedules (epsilon, LR) are driven by the carried n_updates/grad_steps
counters against the FULL-horizon decay constants, and the update scan
consumes the rng CARRIED in runner_state (the fresh per-call rng argument
is only read when runner_state is None), so the segmented trajectory is
**bit-identical to the unsegmented run** — pinned by
tests/test_segmented.py::test_segmented_bitwise_equals_monolith.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from purejaxql_tpu.algo import pqn
from purejaxql_tpu.utils.logging import MetricLogger


def train_segmented(
    config: Dict[str, Any],
    num_segments: int,
    rng: Optional[jax.Array] = None,
    num_seeds: Optional[int] = None,
    logger: Optional[MetricLogger] = None,
    on_segment: Optional[Callable[[int, Any, Dict], None]] = None,
    make_train: Callable = pqn.make_train,
):
    """Train `config` in `num_segments` fused chunks.

    Returns {"runner_state", "metrics"} with metrics concatenated across
    segments along the update axis.
    """
    config = dict(config)
    total = int(float(config["TOTAL_TIMESTEPS"]))
    config["TOTAL_TIMESTEPS_DECAY"] = int(
        float(config.get("TOTAL_TIMESTEPS_DECAY", total))
    )
    assert total % num_segments == 0, "num_segments must divide TOTAL_TIMESTEPS"
    seg_config = dict(config)
    seg_config["TOTAL_TIMESTEPS"] = total // num_segments
    # keep full-horizon decay so schedules span the whole run
    seg_config.setdefault("TOTAL_TIMESTEPS_DECAY", config["TOTAL_TIMESTEPS_DECAY"])

    num_seeds = num_seeds or config.get("NUM_SEEDS", 1)
    rng = jax.random.PRNGKey(config.get("SEED", 0)) if rng is None else rng
    rngs = jax.random.split(rng, num_seeds)

    train = make_train(seg_config, logger=logger)
    fn = jax.jit(jax.vmap(train))

    runner_state = None
    all_metrics = []
    for seg in range(num_segments):
        # The same rngs every segment: segment 0 consumes them exactly like
        # the monolith's train(rng); later segments run off the rng carried
        # inside runner_state, and this argument only feeds the (discarded)
        # re-init — so the whole run is bit-identical to one fused program.
        if runner_state is None:
            outs = fn(rngs)
        else:
            outs = fn(rngs, runner_state)
        runner_state = outs["runner_state"]
        # force completion so segment boundaries are real sync points
        np.asarray(runner_state[0].timesteps)
        all_metrics.append(outs["metrics"])
        if on_segment is not None:
            on_segment(seg, runner_state, outs["metrics"])
        if logger is not None and not config.get("LOG_VIA_CALLBACK", False):
            logger.log_history(outs["metrics"])

    metrics = jax.tree_util.tree_map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=1),
        *all_metrics,
    ) if all_metrics and all_metrics[0] else {}
    return {"runner_state": runner_state, "metrics": metrics}
