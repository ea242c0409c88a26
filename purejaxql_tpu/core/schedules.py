"""Schedules for exploration epsilon, learning rate and action noise
(reference: pqn_gymnax.py:126-139, pqn_mujoco_playground.py:179-183)."""

from __future__ import annotations

import optax


def epsilon_schedule(eps_start: float, eps_finish: float, eps_decay_updates: float):
    """Linear decay of exploration epsilon over `eps_decay_updates` updates."""
    return optax.linear_schedule(eps_start, eps_finish, eps_decay_updates)


def lr_schedule(config):
    """LR: constant, or linear decay to ~0 over all gradient steps when
    LR_LINEAR_DECAY is set (reference: pqn_gymnax.py:132-139)."""
    if config.get("LR_LINEAR_DECAY", False):
        return optax.linear_schedule(
            init_value=config["LR"],
            end_value=1e-20,
            transition_steps=config["NUM_UPDATES_DECAY"]
            * config["NUM_MINIBATCHES"]
            * config["NUM_EPOCHS"],
        )
    return config["LR"]


def noise_schedule(start: float, finish: float, decay_updates: float):
    """Linear decay of Gaussian exploration noise std (continuous control)."""
    return optax.linear_schedule(start, finish, decay_updates)
