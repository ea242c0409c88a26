"""MinAtar env tests: shapes, playability, game-specific invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.envs import make

MINATAR = [
    ("Breakout-MinAtar", 4, 3),
    ("Asterix-MinAtar", 4, 5),
    ("SpaceInvaders-MinAtar", 6, 4),
    ("Freeway-MinAtar", 7, 3),
    ("Seaquest-MinAtar", 10, 6),
]


@pytest.mark.parametrize("name,channels,n_actions", MINATAR)
def test_shapes(name, channels, n_actions):
    env, params = make(name)
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    assert obs.shape == (10, 10, channels)
    assert env.action_space(params).n == n_actions
    assert env.observation_space(params).shape == (10, 10, channels)


@pytest.mark.parametrize("name,channels,n_actions", MINATAR)
def test_random_rollout_finite(name, channels, n_actions):
    env, params = make(name)
    n = 16

    def step(carry, _):
        obs, state, rng = carry
        rng, ra, rs = jax.random.split(rng, 3)
        actions = jax.random.randint(ra, (n,), 0, n_actions)
        keys = jax.random.split(rs, n)
        obs, state, r, d, _ = jax.vmap(env.step, in_axes=(0, 0, 0, None))(
            keys, state, actions, params
        )
        return (obs, state, rng), (r, d, obs)

    keys = jax.random.split(jax.random.PRNGKey(0), n)
    obs, state = jax.vmap(env.reset, in_axes=(0, None))(keys, params)
    (_, _, _), (rs, ds, obss) = jax.lax.scan(
        step, (obs, state, jax.random.PRNGKey(1)), None, 300
    )
    rs, ds, obss = np.asarray(rs), np.asarray(ds), np.asarray(obss)
    assert np.isfinite(rs).all()
    assert ((obss == 0) | (obss == 1)).all()  # binary observation grids
    assert rs.min() >= 0.0


def test_breakout_scores_and_dies():
    """Random play on Breakout must both score (hit bricks) and terminate
    (miss the paddle) within a few hundred vectorized episodes."""
    env, params = make("Breakout-MinAtar")
    n = 64

    def step(carry, _):
        obs, state, rng = carry
        rng, ra, rs = jax.random.split(rng, 3)
        actions = jax.random.randint(ra, (n,), 0, 3)
        keys = jax.random.split(rs, n)
        obs, state, r, d, _ = jax.vmap(env.step, in_axes=(0, 0, 0, None))(
            keys, state, actions, params
        )
        return (obs, state, rng), (r, d)

    keys = jax.random.split(jax.random.PRNGKey(0), n)
    obs, state = jax.vmap(env.reset, in_axes=(0, None))(keys, params)
    (_, _, _), (rs, ds) = jax.lax.scan(
        step, (obs, state, jax.random.PRNGKey(1)), None, 500
    )
    assert np.asarray(rs).sum() > 0, "no bricks ever hit"
    assert np.asarray(ds).sum() > 0, "no episode ever ended"


def test_breakout_good_policy_scores_more():
    """Tracking the ball with the paddle scores much more than random."""
    env, params = make("Breakout-MinAtar")

    def run(policy, key):
        obs, state = env.reset(key, params)

        def step(carry, _):
            obs, state, rng = carry
            rng, rs = jax.random.split(rng)
            action = policy(state, rng)
            obs, state, r, d, _ = env.step(rs, state, action, params)
            return (obs, state, rng), r

        (_, _, _), rs = jax.lax.scan(step, (obs, state, key), None, 400)
        return np.asarray(rs).sum()

    def track(state, rng):
        return jnp.where(
            state.ball_x < state.pos, 1, jnp.where(state.ball_x > state.pos, 2, 0)
        )

    def rand(state, rng):
        return jax.random.randint(rng, (), 0, 3)

    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    good = np.mean([run(track, k) for k in keys])
    bad = np.mean([run(rand, k) for k in keys])
    assert good > bad * 2, (good, bad)


def test_spaceinvaders_kills_score():
    """Always-fire from under the alien block scores quickly."""
    env, params = make("SpaceInvaders-MinAtar")
    obs, state = env.reset(jax.random.PRNGKey(0), params)

    def step(carry, _):
        obs, state, rng = carry
        rng, rs = jax.random.split(rng)
        obs, state, r, d, _ = env.step(rs, state, jnp.asarray(3), params)
        return (obs, state, rng), r

    (_, _, _), rs = jax.lax.scan(
        step, (obs, state, jax.random.PRNGKey(1)), None, 100
    )
    assert np.asarray(rs).sum() >= 2


def test_freeway_up_policy_scores():
    """Walking straight up crosses the road and scores within the limit."""
    env, params = make("Freeway-MinAtar")
    obs, state = env.reset(jax.random.PRNGKey(0), params)

    def step(carry, _):
        obs, state, rng = carry
        rng, rs = jax.random.split(rng)
        obs, state, r, d, _ = env.step(rs, state, jnp.asarray(1), params)
        return (obs, state, rng), r

    (_, _, _), rs = jax.lax.scan(
        step, (obs, state, jax.random.PRNGKey(1)), None, 500
    )
    assert np.asarray(rs).sum() >= 1


def test_asterix_gold_and_death():
    env, params = make("Asterix-MinAtar")
    n = 64

    def step(carry, _):
        obs, state, rng = carry
        rng, ra, rs = jax.random.split(rng, 3)
        actions = jax.random.randint(ra, (n,), 0, 5)
        keys = jax.random.split(rs, n)
        obs, state, r, d, _ = jax.vmap(env.step, in_axes=(0, 0, 0, None))(
            keys, state, actions, params
        )
        return (obs, state, rng), (r, d)

    keys = jax.random.split(jax.random.PRNGKey(0), n)
    obs, state = jax.vmap(env.reset, in_axes=(0, None))(keys, params)
    (_, _, _), (rs, ds) = jax.lax.scan(
        step, (obs, state, jax.random.PRNGKey(1)), None, 500
    )
    assert np.asarray(rs).sum() > 0, "never collected gold"
    assert np.asarray(ds).sum() > 0, "never died"
