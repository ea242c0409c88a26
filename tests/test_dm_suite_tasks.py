"""dm-suite-class task variants: swimmer physics, point mass, acrobot
swingup, and the sparse/dense task splits on the shared dynamics models
(reference playground dm-suite block, scripts/train_playground_all.sh:7-33)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.envs import make
from purejaxql_tpu.algo.pqn_ac import make_train


# ---------------------------------------------------------------- swimmer


def _swim(policy, steps=160, seed=0):
    """Roll the swimmer under a time-indexed gait; return every nose pos."""
    env, params = make("SwimmerSwimmer6-v0")
    obs, state = env.reset(jax.random.PRNGKey(seed), params)

    def body(carry, t):
        state = carry
        a = policy(t, state)
        _, state, r, d, _ = env.step(jax.random.PRNGKey(0), state, a, params)
        return state, state.nose

    state, noses = jax.lax.scan(body, state, jnp.arange(steps))
    return np.asarray(noses), state


def test_swimmer_scallop_theorem():
    """Low-Reynolds physics: a reciprocal (time-symmetric) stroke produces
    ~zero net motion PER CLOSED STROKE CYCLE while an undulatory traveling
    wave keeps swimming. This is THE property resistive-force dynamics
    exist to capture. Displacement is compared over whole gait periods
    after a transient (the first strokes from the random initial shape do
    produce a one-time offset — that is allowed)."""
    period = 32

    def reciprocal(t, state):
        # all joints flap in phase: shape change retraces itself
        return jnp.full(
            (5,), jnp.where((t // (period // 2)) % 2 == 0, 1.0, -1.0)
        )

    def wave(t, state):
        # traveling wave down the body: joint i lags by a fixed phase
        phase = 0.9 * jnp.arange(5)
        return jnp.sin(2 * jnp.pi * t / period - phase)

    noses_r, _ = _swim(reciprocal, steps=3 * period)
    noses_w, _ = _swim(wave, steps=3 * period)
    # displacement across the LAST full period (shape is periodic there)
    d_recip = float(np.linalg.norm(noses_r[-1] - noses_r[-1 - period]))
    d_wave = float(np.linalg.norm(noses_w[-1] - noses_w[-1 - period]))
    assert d_recip < 1e-4, d_recip
    assert d_wave > 20.0 * max(d_recip, 1e-9), (d_wave, d_recip)
    assert d_wave > 0.02, d_wave


def test_swimmer_drag_balance_is_quasistatic():
    """With no joint motion the solved body velocity is exactly zero:
    nothing moves without shape change (no inertia to coast on)."""
    env, params = make("SwimmerSwimmer6-v0")
    obs, state = env.reset(jax.random.PRNGKey(1), params)
    _, s2, _, _, _ = env.step(
        jax.random.PRNGKey(2), state, jnp.zeros(5), params
    )
    assert float(jnp.abs(s2.nose - state.nose).max()) < 1e-7
    assert float(jnp.abs(s2.body_vel).max()) < 1e-7


def test_swimmer_reward_and_obs_frame():
    env, params = make("SwimmerSwimmer6-v0")
    obs, state = env.reset(jax.random.PRNGKey(3), params)
    assert obs.shape == (10,)
    # park the nose on the target: reward saturates at 1
    on_target = state.replace(nose=state.target)
    _, _, r, _, _ = env.step(
        jax.random.PRNGKey(4), on_target, jnp.zeros(5), params
    )
    assert float(r) == 1.0
    # far away: reward 0
    far = state.replace(nose=state.target + jnp.asarray([5.0, 0.0]))
    _, _, r0, _, _ = env.step(jax.random.PRNGKey(5), far, jnp.zeros(5), params)
    assert float(r0) == 0.0


# -------------------------------------------------------------- point mass


def test_point_mass_seeks_origin_and_walls_stick():
    env, params = make("PointMass-v0")
    obs, state = env.reset(jax.random.PRNGKey(0), params)

    # proportional controller toward the origin collects reward
    total = 0.0
    for t in range(120):
        a = -3.0 * state.pos - 1.0 * state.vel
        obs, state, r, d, _ = env.step(jax.random.PRNGKey(t), state, a, params)
        total += float(r)
    assert float(jnp.linalg.norm(state.pos)) < 0.15
    assert total > 20.0, total

    # driving into a wall clips position and zeroes that velocity component
    s = state.replace(pos=jnp.asarray([0.99, 0.0]), vel=jnp.asarray([2.0, 0.0]))
    _, s2, _, _, _ = env.step(
        jax.random.PRNGKey(999), s, jnp.asarray([1.0, 0.0]), params
    )
    assert float(s2.pos[0]) == params.arena
    assert float(s2.vel[0]) == 0.0


# --------------------------------------------------------- acrobot swingup


def test_acrobot_swingup_dense_vs_sparse():
    env_d, params = make("AcrobotSwingup-v0")
    env_s, _ = make("AcrobotSwingupSparse-v0")
    obs, state = env_d.reset(jax.random.PRNGKey(0), params)
    assert obs.shape == (6,)
    # hanging: dense reward near 0, sparse exactly 0
    _, _, rd, _, _ = env_d.step(
        jax.random.PRNGKey(1), state, jnp.asarray([0.0]), params
    )
    _, _, rs, _, _ = env_s.step(
        jax.random.PRNGKey(1), state, jnp.asarray([0.0]), params
    )
    assert float(rd) < 0.15, rd
    assert float(rs) == 0.0
    # forced upright: dense ~1, sparse 1
    up = state.replace(
        joint_angle1=jnp.asarray(jnp.pi),
        joint_angle2=jnp.asarray(0.0),
        velocity_1=jnp.asarray(0.0),
        velocity_2=jnp.asarray(0.0),
    )
    _, _, rd2, _, _ = env_d.step(
        jax.random.PRNGKey(2), up, jnp.asarray([0.0]), params
    )
    _, _, rs2, _, _ = env_s.step(
        jax.random.PRNGKey(2), up, jnp.asarray([0.0]), params
    )
    assert float(rd2) > 0.85, rd2
    assert float(rs2) == 1.0
    # no early termination: full-length episodes
    assert params.max_steps_in_episode == 500


# ------------------------------------------------- task-variant semantics


def test_cartpole_balance_starts_up_swingup_starts_down():
    _, params = make("CartPoleSwingUp-v0")
    env_b, _ = make("CartpoleBalance-v0")
    env_u, _ = make("CartPoleSwingUp-v0")
    ob, _ = env_b.reset(jax.random.PRNGKey(0), params)
    ou, _ = env_u.reset(jax.random.PRNGKey(0), params)
    assert float(ob[2]) > 0.99    # cos(theta): upright
    assert float(ou[2]) < -0.99   # hanging


def test_cartpole_sparse_gates_on_uprightness():
    env, params = make("CartpoleBalanceSparse-v0")
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    _, _, r_up, _, _ = env.step(
        jax.random.PRNGKey(1),
        state.replace(theta=jnp.asarray(0.0), x=jnp.asarray(0.0)),
        jnp.asarray([0.0]),
        params,
    )
    _, _, r_tilt, _, _ = env.step(
        jax.random.PRNGKey(2),
        state.replace(theta=jnp.asarray(0.5)),
        jnp.asarray([0.0]),
        params,
    )
    assert float(r_up) == 1.0
    assert float(r_tilt) == 0.0


def test_reacher_easy_hard_target_radius():
    env_e, params = make("ReacherEasy-v0")
    env_h, _ = make("ReacherHard-v0")
    obs, state = env_e.reset(jax.random.PRNGKey(0), params)
    # put the fingertip ~0.1 from the target: inside easy, outside hard
    theta = jnp.asarray([0.0, 0.0])  # tip at (l1+l2, 0)
    tip = jnp.asarray([params.l1 + params.l2, 0.0])
    s = state.replace(
        theta=theta, theta_dot=jnp.zeros(2), target=tip + jnp.asarray([0.1, 0.0])
    )
    _, _, re, _, _ = env_e.step(jax.random.PRNGKey(1), s, jnp.zeros(2), params)
    _, _, rh, _, _ = env_h.step(jax.random.PRNGKey(1), s, jnp.zeros(2), params)
    assert float(re) == 1.0
    assert float(rh) == 0.0


def test_walker_and_hopper_stand_prefers_stillness():
    env, params = make("WalkerStand-v0")
    envw, _ = make("Walker-v0")
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    tall_still = state.replace(
        z=jnp.asarray(params.leg_length), vx=jnp.asarray(0.0)
    )
    moving = state.replace(
        z=jnp.asarray(params.leg_length), vx=jnp.asarray(2.0)
    )
    _, _, r_still, _, _ = env.step(
        jax.random.PRNGKey(1), tall_still, jnp.zeros(4), params
    )
    _, _, r_move, _, _ = env.step(
        jax.random.PRNGKey(1), moving, jnp.zeros(4), params
    )
    assert float(r_still) > float(r_move)
    # the walk task orders them the other way
    _, _, w_still, _, _ = envw.step(
        jax.random.PRNGKey(1), tall_still, jnp.zeros(4), params
    )
    _, _, w_move, _, _ = envw.step(
        jax.random.PRNGKey(1), moving, jnp.zeros(4), params
    )
    assert float(w_move) > float(w_still)


def test_walker_run_rewards_speed_beyond_walk_saturation():
    env_w, params = make("Walker-v0")
    env_r, _ = make("WalkerRun-v0")
    obs, state = env_w.reset(jax.random.PRNGKey(0), params)
    slow = state.replace(z=jnp.asarray(params.leg_length), vx=jnp.asarray(3.0))
    fast = state.replace(z=jnp.asarray(params.leg_length), vx=jnp.asarray(6.0))
    _, _, w3, _, _ = env_w.step(jax.random.PRNGKey(1), slow, jnp.zeros(4), params)
    _, _, w6, _, _ = env_w.step(jax.random.PRNGKey(1), fast, jnp.zeros(4), params)
    _, _, r3, _, _ = env_r.step(jax.random.PRNGKey(1), slow, jnp.zeros(4), params)
    _, _, r6, _, _ = env_r.step(jax.random.PRNGKey(1), fast, jnp.zeros(4), params)
    # walk saturates at 3 m/s (tiny slack: vx evolves within the step)
    assert abs(float(w6) - float(w3)) < 0.05
    assert float(r6) > float(r3) + 1.0         # run keeps paying to 6 m/s


_NEW_TASKS = [
    "CartPoleSwingUpSparse-v0",
    "CartpoleBalance-v0",
    "CartpoleBalanceSparse-v0",
    "ReacherEasy-v0",
    "ReacherHard-v0",
    "HopperStand-v0",
    "WalkerStand-v0",
    "WalkerRun-v0",
    "AcrobotSwingup-v0",
    "AcrobotSwingupSparse-v0",
    "PointMass-v0",
    "SwimmerSwimmer6-v0",
    "CheetahRun-v0",
]


@pytest.mark.parametrize("env_name", _NEW_TASKS)
def test_new_tasks_step_under_jit_vmap(env_name):
    """Every new task resets/steps under jit(vmap) with finite outputs —
    the property the fused training loop needs."""
    env, params = make(env_name)
    n = 4
    act_shape = env.action_space(params).shape

    @jax.jit
    def run(key):
        keys = jax.random.split(key, n)
        obs, state = jax.vmap(env.reset, in_axes=(0, None))(keys, params)

        def body(carry, t):
            state = carry
            a = jnp.zeros((n,) + act_shape) + 0.3
            sk = jax.random.split(jax.random.fold_in(key, t), n)
            obs, state, r, d, _ = jax.vmap(
                env.step, in_axes=(0, 0, 0, None)
            )(sk, state, a, params)
            return state, (obs, r, d)

        state, (obs, r, d) = jax.lax.scan(body, state, jnp.arange(12))
        return obs, r

    obs, r = run(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(np.asarray(r)).all()


@pytest.mark.parametrize(
    "env_name",
    ["PointMass-v0", "SwimmerSwimmer6-v0", "AcrobotSwingup-v0",
     "CheetahRun-v0"],
)
def test_ac_trains_on_dm_suite_new_envs(env_name):
    config = compose(
        alg="pqn_dm_suite",
        overrides=[
            f"ENV_NAME={env_name}",
            "TOTAL_TIMESTEPS=4096", "NUM_ENVS=16", "NUM_STEPS=16",
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


# ---------------------------------------------------------------- cheetah


def _gallop(policy, steps=300, seed=0):
    env, params = make("CheetahRun-v0")
    obs, state = env.reset(jax.random.PRNGKey(seed), params)

    def body(carry, t):
        state = carry
        _, state, r, d, _ = env.step(
            jax.random.PRNGKey(0), state, policy(t), params
        )
        return state, (state.x, state.pitch, r, d)

    state, outs = jax.lax.scan(body, state, jnp.arange(steps))
    return tuple(np.asarray(o) for o in outs)


def test_cheetah_rear_planted_feet_propel_forward():
    """SLIP propulsion: planting feet BEHIND the hips (negative touchdown
    angle) makes the stance springs push forward — sustained fast
    forward motion without falling; planting them ahead brakes."""
    back = lambda t: jnp.concatenate(
        [jnp.full(4, -0.5), jnp.full(4, 0.9)]
    )
    xs_b, pitch_b, r_b, d_b = _gallop(back, steps=200)
    assert xs_b[-1] > 5.0, xs_b[-1]
    assert d_b.sum() == 0  # never fell
    fwd = lambda t: jnp.concatenate([jnp.full(4, 0.5), jnp.full(4, 0.9)])
    xs_f, *_ = _gallop(fwd, steps=200)
    assert xs_b[-1] > xs_f[-1] + 3.0, (xs_b[-1], xs_f[-1])


def test_cheetah_fore_only_thrust_pitches_the_body():
    """The rigid-body ingredient the Walker lacks: thrusting ONLY the
    fore pair torques the torso (nose up), while symmetric thrust keeps
    pitch near zero. Forces act at the hips, not the COM."""
    fore_only = lambda t: jnp.concatenate(
        [jnp.zeros(4), jnp.array([1.0, 1.0, 0.0, 0.0])]
    )
    sym = lambda t: jnp.concatenate([jnp.zeros(4), jnp.full(4, 0.5)])
    _, pitch_fore, _, _ = _gallop(fore_only, steps=60)
    _, pitch_sym, _, _ = _gallop(sym, steps=60)
    assert np.abs(pitch_fore).max() > 3.0 * max(
        np.abs(pitch_sym).max(), 1e-3
    ), (np.abs(pitch_fore).max(), np.abs(pitch_sym).max())


def test_cheetah_somersault_terminates():
    """|pitch| beyond the limit ends the episode (a tumbling cheetah has
    fallen), and the reward carries the fall penalty."""
    env, params = make("CheetahRun-v0")
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    state = state.replace(pitch=jnp.asarray(1.2))
    assert bool(env.is_terminal(state, params))
