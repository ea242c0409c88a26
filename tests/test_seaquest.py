"""Seaquest-MinAtar mechanic tests (state-injected unit checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.envs import make


def fresh(seed=0):
    env, params = make("Seaquest-MinAtar")
    obs, state = env.reset(jax.random.PRNGKey(seed), params)
    return env, params, state


def test_shapes_and_random_play():
    env, params, state = fresh()
    assert env.observation_space(params).shape == (10, 10, 10)
    assert env.action_space(params).n == 6
    rng = jax.random.PRNGKey(1)
    total_r, total_d = 0.0, 0
    for t in range(300):
        rng, ka, ks = jax.random.split(rng, 3)
        a = jax.random.randint(ka, (), 0, 6)
        obs, state, r, d, _ = env.step(ks, state, a, params)
        total_r += float(r)
        total_d += int(d)
        assert ((np.asarray(obs) == 0) | (np.asarray(obs) == 1)).all()
    assert total_d > 0  # oxygen/enemies end episodes


def test_oxygen_depletes_underwater_and_kills():
    env, params, state = fresh()
    state = state.replace(
        sub_y=jnp.asarray(4), surfaced=jnp.asarray(False),
        oxygen=jnp.asarray(1),
    )
    # two noops underwater: oxygen 1 -> 0 -> -1 => terminal
    obs, state, r, d, _ = env.step_env(jax.random.PRNGKey(0), state, jnp.asarray(0), params)
    assert not bool(d)
    obs, state, r, d, _ = env.step_env(jax.random.PRNGKey(1), state, jnp.asarray(0), params)
    assert bool(d)


def test_diver_pickup_and_surface_refill():
    env, params, state = fresh()
    state = state.replace(
        sub_x=jnp.asarray(5), sub_y=jnp.asarray(4),
        surfaced=jnp.asarray(False), oxygen=jnp.asarray(50),
        d_exists=state.d_exists.at[0].set(True),
        d_x=state.d_x.at[0].set(5),
        d_y=state.d_y.at[0].set(3),
        d_timer=state.d_timer.at[0].set(100),  # keep the diver still
    )
    # move up onto the diver -> pickup
    obs, s2, r, d, _ = env.step_env(jax.random.PRNGKey(0), state, jnp.asarray(2), params)
    assert int(s2.divers) == 1
    assert not bool(s2.d_exists[0])

    # surface: oxygen refills, one diver consumed
    s2 = s2.replace(sub_y=jnp.asarray(1))
    obs, s3, r, d, _ = env.step_env(jax.random.PRNGKey(1), s2, jnp.asarray(2), params)
    assert int(s3.sub_y) == 0
    assert not bool(d)
    assert int(s3.oxygen) == params.max_oxygen
    assert int(s3.divers) == 0


def test_surfacing_without_diver_is_fatal():
    env, params, state = fresh()
    state = state.replace(
        sub_y=jnp.asarray(1), surfaced=jnp.asarray(False),
        divers=jnp.asarray(0), oxygen=jnp.asarray(50),
    )
    obs, s2, r, d, _ = env.step_env(jax.random.PRNGKey(0), state, jnp.asarray(2), params)
    assert bool(d)


def test_shooting_fish_scores():
    env, params, state = fresh()
    state = state.replace(
        sub_x=jnp.asarray(3), sub_y=jnp.asarray(4), sub_or=jnp.asarray(1),
        surfaced=jnp.asarray(False),
        f_exists=state.f_exists.at[0].set(True),
        f_x=state.f_x.at[0].set(4),
        f_y=state.f_y.at[0].set(4),
        f_timer=state.f_timer.at[0].set(100),  # hold still
    )
    # fire right: bullet spawns at sub, moves to x=4 = fish position
    obs, s2, r, d, _ = env.step_env(jax.random.PRNGKey(0), state, jnp.asarray(5), params)
    assert float(r) == 1.0
    assert not bool(s2.f_exists[0])


def test_enemy_collision_kills():
    env, params, state = fresh()
    state = state.replace(
        sub_x=jnp.asarray(4), sub_y=jnp.asarray(4),
        surfaced=jnp.asarray(False),
        f_exists=state.f_exists.at[0].set(True),
        f_x=state.f_x.at[0].set(4),
        f_y=state.f_y.at[0].set(4),
        f_timer=state.f_timer.at[0].set(100),
    )
    obs, s2, r, d, _ = env.step_env(jax.random.PRNGKey(0), state, jnp.asarray(0), params)
    assert bool(d)
