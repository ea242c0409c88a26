"""Optimizer factory: global-norm clip -> RAdam, the PQN default
(reference: pqn_gymnax.py:153-156)."""

from __future__ import annotations

import optax


def make_optimizer(max_grad_norm: float, learning_rate) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.radam(learning_rate=learning_rate),
    )
