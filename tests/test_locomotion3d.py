"""3D locomotion (quadruped/biped joystick), finger, and fish domains:
physics property tests + AC-PQN training smoke.

These back the reference's playground locomotion block
(/root/reference/scripts/train_playground_all.sh:53-114) and the
Finger/Fish dm-suite rows (:16-19)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.envs import make
from purejaxql_tpu.envs.classic.locomotion3d import _ground
from purejaxql_tpu.algo.pqn_ac import make_train


def _scan_rollout(env, params, state, policy, steps):
    """Constant-or-time-indexed policy rolled via one compiled scan."""

    def body(carry, t):
        st = carry
        a = policy(t, st)
        obs, st, r, d, _ = env.step(
            jax.random.fold_in(jax.random.PRNGKey(7), t), st, a, params
        )
        return st, (r, d, st.z if hasattr(st, "z") else r)

    return jax.lax.scan(body, state, jnp.arange(steps))


# ------------------------------------------------------------- quadruped


def test_quadruped_passive_standing():
    """Zero action: the spring legs settle to k*comp = m*g equilibrium —
    the robot STANDS indefinitely instead of collapsing. The basic
    sanity property of the SLIP contact model."""
    env, params = make("Go1JoystickFlatTerrain")
    _, state = env.reset(jax.random.PRNGKey(0), params)
    state, (rs, ds, zs) = _scan_rollout(
        env, params, state, lambda t, s: jnp.zeros(12), 300
    )
    assert not bool(np.asarray(ds).any()), "passive quadruped fell"
    # settled height stays near standing height, well above the fall line
    tail_z = np.asarray(zs)[-100:]
    assert (tail_z > params.min_height_frac * params.leg_length + 0.05).all()


def test_quadruped_rear_thrust_rotates_nose_down():
    """Differential thrust is the pitch authority the handstand tasks
    rely on: thrusting only the REAR legs lifts the rear, rotating the
    nose DOWN (toward the handstand posture, pitch target -1.1)."""
    env, params = make("Go1Handstand")
    _, state = env.reset(jax.random.PRNGKey(1), params)
    rear = jnp.zeros(12).at[10:12].set(1.0)  # thrust channels, legs 2/3
    pitches = []
    for t in range(25):
        _, state, _, _, _ = env.step(
            jax.random.fold_in(jax.random.PRNGKey(2), t), state, rear, params
        )
        pitches.append(float(state.pitch))
    assert min(pitches) < -0.05, min(pitches)


def test_quadruped_joystick_reward_tracks_command():
    """Reward is body-frame velocity tracking: moving WITH the command
    beats moving AGAINST it (same speed, same posture)."""
    env, params = make("Go1JoystickFlatTerrain")
    _, state = env.reset(jax.random.PRNGKey(3), params)
    cmd = jnp.array([1.0, 0.0, 0.0])
    with_cmd = state.replace(command=cmd, vx=jnp.asarray(1.0))
    against = state.replace(command=cmd, vx=jnp.asarray(-1.0))
    a = jnp.zeros(12)
    r_with = env._reward(with_cmd, a, params)
    r_against = env._reward(against, a, params)
    assert float(r_with) > float(r_against) + 0.5


def test_rough_terrain_field_and_flat_zero():
    env_f, p_flat = make("Go1JoystickFlatTerrain")
    env_r, p_rough = make("Go1JoystickRoughTerrain")
    xs = jnp.linspace(-3.0, 3.0, 64)
    gh_flat = _ground(p_flat, xs, xs)
    gh_rough = _ground(p_rough, xs, xs)
    assert float(jnp.abs(gh_flat).max()) == 0.0
    assert float(jnp.abs(gh_rough).max()) > 0.01
    assert float(jnp.abs(gh_rough).max()) < 0.2  # stays steppable


def test_getup_starts_low_and_height_is_rewarded():
    env, params = make("Go1Getup")
    _, low = env.reset(jax.random.PRNGKey(4), params)
    assert float(low.z) < 0.5 * params.leg_length
    high = low.replace(z=jnp.asarray(params.leg_length * 0.95))
    a = jnp.zeros(12)
    assert float(env._reward(high, a, params)) > float(
        env._reward(low, a, params)
    )


def test_handstand_footstand_reward_peaks_at_target_pitch():
    for name, target in (("Go1Handstand", -1.1), ("Go1Footstand", 1.1)):
        env, params = make(name)
        _, state = env.reset(jax.random.PRNGKey(5), params)
        a = jnp.zeros(12)
        at_tgt = env._reward(state.replace(pitch=jnp.asarray(target)), a, params)
        level = env._reward(state.replace(pitch=jnp.asarray(0.0)), a, params)
        wrong = env._reward(state.replace(pitch=jnp.asarray(-target)), a, params)
        assert float(at_tgt) > float(level) > float(wrong), name


def test_robot_presets_differ():
    """Per-robot presets are real parameter changes, not renames."""
    go1 = make("Go1JoystickFlatTerrain")[1]
    spot = make("SpotFlatTerrainJoystick")[1]
    barkour = make("BarkourJoystick")[1]
    assert spot.mass > 2 * go1.mass and spot.leg_length > go1.leg_length
    assert barkour.cmd_vx > go1.cmd_vx  # barkour is the speed platform
    h1 = make("H1JoystickGaitTracking")[1]
    op3 = make("Op3Joystick")[1]
    assert h1.mass > 10 * op3.mass and h1.leg_length > 3 * op3.leg_length


# ----------------------------------------------------------------- biped


def test_biped_torso_is_unstable_without_control():
    """The torso is an inverted pendulum: from a small lean with zero hip
    torque, pitch diverges (to termination or the clip)."""
    env, params = make("HumanoidStand")
    _, state = env.reset(jax.random.PRNGKey(6), params)
    state = state.replace(pitch=jnp.asarray(0.25))
    fell = False
    for t in range(120):
        _, state, _, d, _ = env.step(
            jax.random.fold_in(jax.random.PRNGKey(8), t),
            state, jnp.zeros(7), params,
        )
        if bool(d):
            fell = True
            break
    assert fell, "uncontrolled biped torso never fell"


def test_biped_hip_torque_stabilizes_torso():
    """A proportional hip-torque controller keeps the same lean upright —
    the pitch channel has real control authority."""
    env, params = make("HumanoidStand")
    _, state = env.reset(jax.random.PRNGKey(6), params)
    state = state.replace(pitch=jnp.asarray(0.25))
    for t in range(120):
        a = jnp.zeros(7).at[6].set(
            jnp.clip(-4.0 * state.pitch - 1.0 * state.pitch_rate, -1, 1)
        )
        _, state, _, d, _ = env.step(
            jax.random.fold_in(jax.random.PRNGKey(8), t), state, a, params
        )
        assert not bool(d), f"controlled biped fell at t={t}"
    assert abs(float(state.pitch)) < 0.25


# ---------------------------------------------------------------- finger


def test_finger_spinner_untouched_stays_still():
    env, params = make("FingerSpin")
    _, state = env.reset(jax.random.PRNGKey(9), params)
    spin0 = float(state.spin)
    state, _ = _scan_rollout(
        env, params, state, lambda t, s: jnp.zeros(2), 50
    )
    assert abs(float(state.spin) - spin0) < 1e-4
    assert abs(float(state.spin_vel)) < 1e-4


def test_finger_contact_transfers_momentum_to_spinner():
    """Place the fingertip inside the rim with joint velocity: friction
    must set the spinner moving (the mechanism behind all three tasks)."""
    env, params = make("FingerSpin")
    _, state = env.reset(jax.random.PRNGKey(10), params)
    # grid-search joint angles whose tip sits just inside the rim
    q1 = np.linspace(-1.5, 1.5, 120)
    q2 = np.linspace(-1.5, 1.5, 120)
    Q1, Q2 = np.meshgrid(q1, q2)
    tx = params.link1 * np.sin(Q1) + params.link2 * np.sin(Q1 + Q2)
    ty = -params.link1 * np.cos(Q1) - params.link2 * np.cos(Q1 + Q2)
    d = np.hypot(tx - params.cx, ty - params.cy)
    i, j = np.unravel_index(np.argmin(np.abs(d - 0.8 * params.radius)), d.shape)
    state = state.replace(
        q=jnp.array([Q1[i, j], Q2[i, j]]),
        qd=jnp.array([6.0, 0.0]),
        spin_vel=jnp.asarray(0.0),
    )
    _, state, _, _, _ = env.step(
        jax.random.PRNGKey(11), state, jnp.zeros(2), params
    )
    assert abs(float(state.spin_vel)) > 0.05, float(state.spin_vel)


def test_finger_turn_reward_peaks_at_target():
    for name in ("FingerTurnEasy", "FingerTurnHard"):
        env, params = make(name)
        _, state = env.reset(jax.random.PRNGKey(12), params)
        tgt = float(state.target)
        at = state.replace(spin=jnp.asarray(tgt), time=jnp.asarray(1))
        off = state.replace(spin=jnp.asarray(tgt + 1.5), time=jnp.asarray(1))
        # reward is computed in step_env; probe via a zero-substep step is
        # not available, so evaluate the same formula the env uses
        def rew(s):
            tol = 0.6 if name == "FingerTurnEasy" else 0.15
            err = jnp.arctan2(jnp.sin(s.spin - s.target), jnp.cos(s.spin - s.target))
            return float(jnp.exp(-(err**2) / (2 * tol**2)))
        assert rew(at) > 0.95 and rew(off) < 0.5 * rew(at), name
    # hard tolerance is genuinely tighter than easy at the same error
    easy_r = np.exp(-(0.4**2) / (2 * 0.6**2))
    hard_r = np.exp(-(0.4**2) / (2 * 0.15**2))
    assert hard_r < 0.2 * easy_r


# ------------------------------------------------------------------ fish


def test_fish_tail_flapping_propels_forward():
    """Undulatory tail motion generates net thrust along the heading;
    a motionless tail generates none. Resistive-force swimming 101."""
    env, params = make("FishSwim")
    _, s0 = env.reset(jax.random.PRNGKey(13), params)
    heading = np.array([np.cos(float(s0.heading)), np.sin(float(s0.heading))])

    def flap(t, s):
        return jnp.array([jnp.sin(2 * jnp.pi * t / 12.0), 0.0, 0.0])

    s_flap, _ = _scan_rollout(env, params, s0, flap, 200)
    s_idle, _ = _scan_rollout(
        env, params, s0, lambda t, s: jnp.zeros(3), 200
    )
    d_flap = np.dot(
        [float(s_flap.x - s0.x), float(s_flap.y - s0.y)], heading
    )
    d_idle = np.hypot(float(s_idle.x - s0.x), float(s_idle.y - s0.y))
    assert d_flap > 0.05, d_flap
    assert d_idle < 0.01, d_idle


def test_fish_fins_turn_and_thrust():
    env, params = make("FishSwim")
    _, s0 = env.reset(jax.random.PRNGKey(14), params)
    both = _scan_rollout(
        env, params, s0, lambda t, s: jnp.array([0.0, 1.0, 1.0]), 150
    )[0]
    left_only = _scan_rollout(
        env, params, s0, lambda t, s: jnp.array([0.0, 1.0, -1.0]), 150
    )[0]
    # both fins: forward displacement; left-only: net clockwise turn
    heading = np.array([np.cos(float(s0.heading)), np.sin(float(s0.heading))])
    d_both = np.dot([float(both.x - s0.x), float(both.y - s0.y)], heading)
    assert d_both > 0.05, d_both
    assert float(left_only.heading) < float(s0.heading) - 0.05


def test_fish_reward_increases_toward_target():
    env, params = make("FishSwim")
    _, state = env.reset(jax.random.PRNGKey(15), params)
    near = state.replace(
        x=state.target[0] + 0.05, y=state.target[1], time=jnp.asarray(1)
    )
    far = state.replace(
        x=state.target[0] + 1.5, y=state.target[1], time=jnp.asarray(1)
    )
    # probe via obs: body-frame target vector must shrink
    on = np.asarray(env.get_obs(near, params)[:2])
    off = np.asarray(env.get_obs(far, params)[:2])
    assert np.linalg.norm(on) < np.linalg.norm(off)


# ------------------------------------------------------- training smoke


@pytest.mark.parametrize(
    "env_name",
    ["Go1JoystickFlatTerrain", "HumanoidWalk", "FingerSpin", "FishSwim"],
)
def test_ac_trains_on_locomotion3d(env_name):
    config = compose(
        alg="pqn_locomotion",
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


def test_registry_covers_reference_playground_block():
    """Every task name in the reference's train_playground_all.sh resolves
    through this package's registry (scripts/train_playground_all.sh)."""
    from purejaxql_tpu.envs.registry import registered_envs

    names = set(registered_envs())
    reference_tasks = [
        # dm-suite block (:7-33)
        "AcrobotSwingup", "AcrobotSwingupSparse", "BallInCup",
        "CartpoleBalance", "CartpoleBalanceSparse", "CartpoleSwingup",
        "CartpoleSwingupSparse", "CheetahRun", "FingerSpin",
        "FingerTurnEasy", "FingerTurnHard", "FishSwim", "HopperHop",
        "HopperStand", "HumanoidStand", "HumanoidWalk", "HumanoidRun",
        "PendulumSwingup", "PointMass", "ReacherEasy", "ReacherHard",
        "SwimmerSwimmer6", "WalkerRun", "WalkerStand", "WalkerWalk",
        # locomotion block (:53-114)
        "BerkeleyHumanoidJoystickFlatTerrain",
        "BerkeleyHumanoidJoystickRoughTerrain",
        "G1JoystickFlatTerrain", "G1JoystickRoughTerrain",
        "Go1Footstand", "Go1Getup", "Go1Handstand",
        "Go1JoystickFlatTerrain", "Go1JoystickRoughTerrain",
        "H1InplaceGaitTracking", "H1JoystickGaitTracking",
        "SpotFlatTerrainJoystick", "SpotGetup",
        "SpotJoystickGaitTracking", "T1JoystickFlatTerrain",
        "ApolloJoystickFlatTerrain", "BarkourJoystick", "Op3Joystick",
        "T1JoystickRoughTerrain",
    ]
    missing = [n for n in reference_tasks if n not in names]
    assert not missing, missing

    # the in-tree dynamics behind them are distinct models, not renames
    obs_dims = set()
    for n in ("Go1JoystickFlatTerrain", "HumanoidWalk", "FingerSpin",
              "FishSwim", "CheetahRun", "WalkerWalk"):
        env, params = make(n)
        obs_dims.add(env.observation_space(params).shape)
    assert len(obs_dims) >= 5
