"""Train state for online Q-learning: params + optimizer + batch-norm stats
plus on-device progress counters (reference: pqn_gymnax.py:71-75)."""

from __future__ import annotations

from typing import Any

from flax.training.train_state import TrainState


class PQNTrainState(TrainState):
    """TrainState carrying mutable batch statistics and progress counters.

    All counters live on-device so the whole training run stays a single XLA
    program; they drive the epsilon/LR schedules and in-graph eval cadence.
    """

    batch_stats: Any = None
    timesteps: int = 0
    n_updates: int = 0
    grad_steps: int = 0
