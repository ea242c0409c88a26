"""New continuous-control envs: dynamics sanity + AC-PQN training smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.envs import make
from purejaxql_tpu.algo.pqn_ac import make_train


def rollout(env_name, policy, steps=200, seed=0, **env_kwargs):
    env, params = make(env_name, **env_kwargs)
    obs, state = env.reset(jax.random.PRNGKey(seed), params)
    total, dones = 0.0, 0
    for t in range(steps):
        a = policy(t, obs)
        obs, state, r, d, _ = env.step(
            jax.random.PRNGKey(t), state, jnp.asarray(a), params
        )
        total += float(r)
        dones += int(d)
    return total, dones, state


def test_mountain_car_continuous_bang_bang_solves():
    """The classic energy-pumping policy (push along velocity) solves it."""
    env, params = make("MountainCarContinuous-v0")
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    solved = False
    for t in range(400):
        a = jnp.asarray([jnp.sign(state.velocity) * 1.0])
        obs, state, r, d, _ = env.step(jax.random.PRNGKey(t), state, a, params)
        if float(r) > 50:
            solved = True
            break
    assert solved


def test_swingup_starts_down_rewards_up():
    env, params = make("CartPoleSwingUp-v0")
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    # hanging down: cos(theta) ~ -1, reward near 0
    assert float(obs[2]) < -0.9
    obs, state, r, d, _ = env.step(
        jax.random.PRNGKey(1), state, jnp.asarray([0.0]), params
    )
    assert 0.0 <= float(r) < 0.2
    # force the pole upright by hand and check the bonus is near max
    up = state.replace(theta=jnp.asarray(0.0), x=jnp.asarray(0.0))
    obs2, _, r2, _, _ = env.step(
        jax.random.PRNGKey(2), up, jnp.asarray([0.0]), params
    )
    assert float(r2) > 0.9


def test_hopper_thrust_sustains_and_angle_steers():
    """Leg thrust is what keeps the hopper alive (damping bleeds passive
    energy), and the touchdown angle steers horizontal motion with
    Raibert semantics (foot planted forward decelerates, backward
    accelerates)."""
    env, params = make("Hopper-v0")

    def sim(a0, a1, steps=300):
        obs, state = env.reset(jax.random.PRNGKey(3), params)
        resets = 0
        for t in range(steps):
            obs, state, r, d, _ = env.step(
                jax.random.PRNGKey(t), state, jnp.asarray([a0, a1]), params
            )
            resets += int(bool(d))
        return resets, float(state.x)

    passive_resets, _ = sim(0.0, 0.0)
    thrust_resets, _ = sim(0.0, 0.9)
    assert passive_resets > thrust_resets, (passive_resets, thrust_resets)
    assert thrust_resets == 0

    _, x_fwd_foot = sim(0.3, 0.6)
    _, x_back_foot = sim(-0.3, 0.6)
    assert x_back_foot > 5.0, x_back_foot
    assert x_fwd_foot < -5.0, x_fwd_foot


def test_hopper_phase_transitions():
    env, params = make("Hopper-v0")
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    phases = set()
    for t in range(120):
        obs, state, r, d, _ = env.step(
            jax.random.PRNGKey(t), state, jnp.asarray([0.0, 0.5]), params
        )
        phases.add(bool(state.stance))
    assert phases == {True, False}  # both flight and stance occurred


def test_pusher_contact_pushes_puck():
    """The disk-contact model: an overlapping fingertip de-penetrates the
    puck and transfers approach velocity; a distant puck never moves."""
    env, params = make("Pusher-v0")
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    # theta = [0, 0] puts the fingertip at (l1+l2, 0) = (1, 0)
    base = state.replace(
        theta=jnp.zeros(2), theta_dot=jnp.zeros(2),
        puck=jnp.asarray([1.08, 0.0]), puck_vel=jnp.zeros(2),
    )
    _, s1, _, _, _ = env.step(
        jax.random.PRNGKey(1), base, jnp.zeros(2), params
    )
    # overlap (dist .08 < contact_radius .2) resolved outward along +x
    assert float(s1.puck[0]) > 1.11, s1.puck
    # pushing the shoulder drives the tip into the puck: it picks up speed
    moving = base.replace(puck=jnp.asarray([1.05, 0.12]))
    s = moving
    for t in range(5):
        _, s, _, _, _ = env.step(
            jax.random.PRNGKey(t), s, jnp.asarray([1.0, 0.0]), params
        )
    assert float(jnp.linalg.norm(s.puck - moving.puck)) > 0.1
    # a puck across the arena is untouched
    far = base.replace(puck=jnp.asarray([-0.8, 0.0]))
    _, s2, _, _, _ = env.step(
        jax.random.PRNGKey(2), far, jnp.asarray([1.0, 1.0]), params
    )
    assert float(jnp.linalg.norm(s2.puck - far.puck)) < 1e-6
    assert float(jnp.abs(s2.puck_vel).max()) == 0.0


def test_pusher_goal_bonus_and_reset_geometry():
    env, params = make("Pusher-v0")
    obs, state = env.reset(jax.random.PRNGKey(3), params)
    # reset keeps the puck pushable and the goal reachable
    reach = params.l1 + params.l2
    assert 0.25 < float(jnp.linalg.norm(state.puck)) < reach - 0.2
    assert float(jnp.linalg.norm(state.goal)) < reach
    assert obs.shape == (18,)
    # puck parked on the goal with the tip beside it: in-goal bonus nets
    # a clearly positive reward
    near_goal = state.replace(
        theta=jnp.zeros(2), theta_dot=jnp.zeros(2),
        puck=state.goal, puck_vel=jnp.zeros(2),
    )
    tip = jnp.asarray([1.0, 0.0])
    near_goal = near_goal.replace(goal=tip + 0.2, puck=tip + 0.2)
    _, _, r, _, _ = env.step(
        jax.random.PRNGKey(4), near_goal, jnp.zeros(2), params
    )
    assert float(r) > 0.5, r


def test_ball_in_cup_string_and_catch():
    """The string constraint bounds the ball to the cup; a slow ball in
    the mouth scores the sparse catch reward, a fast flythrough doesn't."""
    env, params = make("BallInCup-v0")
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    # reset: ball hangs one string length below the cup
    rel = np.asarray(state.ball - state.cup)
    assert abs(np.linalg.norm(rel) - params.string_len) < 1e-5
    # the string is inextensible under arbitrary cup waving
    max_dist = 0.0
    for t in range(150):
        a = jnp.asarray([np.sin(t * 0.3), np.cos(t * 0.21)])
        obs, state, r, d, _ = env.step(jax.random.PRNGKey(t), state, a, params)
        dist = float(jnp.linalg.norm(state.ball - state.cup))
        max_dist = max(max_dist, dist)
    assert max_dist <= params.string_len + 1e-4, max_dist
    # a slow ball resting in the mouth catches (reward >= 1)
    caught = state.replace(
        ball=state.cup + jnp.asarray([0.0, -params.mouth_depth / 2]),
        ball_vel=state.cup_vel,
        cup_vel=jnp.zeros(2) + state.cup_vel * 0,
    )
    caught = caught.replace(ball_vel=caught.cup_vel)
    _, _, r1, _, _ = env.step(
        jax.random.PRNGKey(999), caught, jnp.zeros(2), params
    )
    assert float(r1) >= 1.0, float(r1)
    # the same geometry at high relative speed does NOT catch
    fly = caught.replace(
        ball_vel=caught.cup_vel + jnp.asarray([0.0, 3.0 * params.catch_speed])
    )
    _, _, r2, _, _ = env.step(jax.random.PRNGKey(998), fly, jnp.zeros(2), params)
    assert float(r2) < 1.0, float(r2)


def test_walker_two_leg_physics():
    """Passive walker collapses; thrust on both legs sustains pogo-style
    double-support hopping (the biped generalizes the hopper's SLIP)."""
    env, params = make("Walker-v0")

    def sim(a, steps=300):
        obs, state = env.reset(jax.random.PRNGKey(3), params)
        resets = 0
        for t in range(steps):
            obs, state, r, d, _ = env.step(
                jax.random.PRNGKey(t), state, jnp.asarray(a), params
            )
            resets += int(bool(d))
        return resets, state

    passive_resets, _ = sim([0.0, 0.0, 0.0, 0.0])
    thrust_resets, s_thrust = sim([0.0, 0.0, 0.9, 0.9])
    assert passive_resets > thrust_resets, (passive_resets, thrust_resets)
    assert thrust_resets == 0
    # split-angle stance engages both legs at some point (double support
    # exists) and single-leg thrust alone cannot match two legs
    one_leg_resets, _ = sim([0.0, 0.0, 0.9, -1.0])
    assert one_leg_resets >= thrust_resets


@pytest.mark.parametrize(
    "alg,env_name",
    [
        ("pqn_dm_suite", "CartPoleSwingUp-v0"),
        ("pqn_dm_suite", "MountainCarContinuous-v0"),
        ("pqn_dm_suite", "BallInCup-v0"),
        ("pqn_locomotion", "Hopper-v0"),
        ("pqn_locomotion", "Walker-v0"),
        ("pqn_manipulation", "Pusher-v0"),
    ],
)
def test_ac_trains_on_new_envs(alg, env_name):
    config = compose(
        alg=alg,
        overrides=[
            f"ENV_NAME={env_name}",
            "TOTAL_TIMESTEPS=8192", "NUM_ENVS=16", "NUM_STEPS=16",
            "NUM_MINIBATCHES=2", "NUM_EPOCHS=1",
            "ACTOR_HIDDEN_SIZES=[32,32]", "CRITIC_HIDDEN_SIZES=[32,32]",
            "TEST_DURING_TRAINING=False", "TEST_NUM_ENVS=8",
        ],
    )
    outs = jax.block_until_ready(
        jax.jit(jax.vmap(make_train(config)))(
            jax.random.split(jax.random.PRNGKey(0), 1)
        )
    )
    assert np.isfinite(np.asarray(outs["metrics"]["value_loss"])).all()


@pytest.mark.slow
def test_ac_learns_swingup():
    """Learning evidence: swing-up returns improve well above the hanging
    baseline within 1M steps."""
    config = compose(
        alg="pqn_dm_suite",
        overrides=["TOTAL_TIMESTEPS=1000000", "NUM_ENVS=64", "TEST_NUM_ENVS=32"],
    )
    outs = jax.block_until_ready(
        jax.jit(jax.vmap(make_train(config)))(
            jax.random.split(jax.random.PRNGKey(0), 1)
        )
    )
    rets = np.asarray(outs["metrics"]["test/returned_episode_returns"][0])
    assert rets[-5:].mean() > 100, rets[-10:]  # hanging ~0-30, upright ~500
