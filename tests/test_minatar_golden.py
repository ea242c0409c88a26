"""Golden trajectory pins for MinAtar envs: a fixed seed + action script
must reproduce recorded rewards/dones exactly (guards game-logic
refactors the way test_golden.py guards the engine RNG tree)."""

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.envs import make


def scripted_trace(name, actions, seed=0):
    env, params = make(name)
    obs, state = env.reset(jax.random.PRNGKey(seed), params)
    rewards, dones = [], []
    for t, a in enumerate(actions):
        obs, state, r, d, _ = env.step(
            jax.random.PRNGKey(1000 + t), state, jnp.asarray(a), params
        )
        rewards.append(float(r))
        dones.append(bool(d))
    return rewards, dones


def test_breakout_tracking_trace():
    """Paddle-tracking for 60 steps: pinned reward positions."""
    env, params = make("Breakout-MinAtar")
    obs, state = env.reset(jax.random.PRNGKey(3), params)
    rewards = []
    for t in range(60):
        action = int(
            np.where(
                state.ball_x < state.pos, 1, np.where(state.ball_x > state.pos, 2, 0)
            )
        )
        obs, state, r, d, _ = env.step(
            jax.random.PRNGKey(t), state, jnp.asarray(action), params
        )
        rewards.append(float(r))
    # Recorded 2026-08-17: the tracker scores these brick hits in 60 steps.
    got = [i for i, r in enumerate(rewards) if r > 0]
    assert got == GOLDEN_BREAKOUT_HITS, got


def test_freeway_up_trace():
    rewards, dones = scripted_trace("Freeway-MinAtar", [1] * 80, seed=1)
    got = [i for i, r in enumerate(rewards) if r > 0]
    assert got == GOLDEN_FREEWAY_SCORES, got


def test_spaceinvaders_fire_trace():
    rewards, dones = scripted_trace("SpaceInvaders-MinAtar", [3] * 60, seed=2)
    got = [i for i, r in enumerate(rewards) if r > 0]
    assert got == GOLDEN_SI_KILLS, got


# Golden values recorded at introduction; update only with a note
# explaining the intended dynamics change.
GOLDEN_BREAKOUT_HITS = [10, 20, 31, 42, 52]
GOLDEN_FREEWAY_SCORES = [68]
GOLDEN_SI_KILLS = [5, 12, 17, 23, 30, 35, 41, 48, 53, 59]
