"""Reference-named manipulation block: physics property tests + AC
training smoke + full 52-task playground registry check.

Backs the reference's manipulation rows
(/root/reference/scripts/train_playground_all.sh:117-163): PandaPickCube
(+Cartesian/Orientation), PandaRobotiqPushCube, AlohaHandOver,
AlohaSinglePegInsertion, LeapCubeReorient/RotateZAxis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.envs import make
from purejaxql_tpu.algo.pqn_ac import make_train


def _roll(env, params, state, policy, steps, key=11):
    def body(carry, t):
        st = carry
        obs, st, r, d, _ = env.step(
            jax.random.fold_in(jax.random.PRNGKey(key), t),
            st, policy(t, st), params,
        )
        return st, r

    return jax.lax.scan(body, state, jnp.arange(steps))


# ------------------------------------------------------- PandaPickCube


def test_panda_pick_second_order_momentum():
    """Acceleration control: after a burst of +x command, a zero command
    leaves the gripper coasting (velocity decays, does not vanish) —
    the property that distinguishes it from the velocity-controlled
    PandaPickCubeCartesian."""
    env, params = make("PandaPickCube")
    _, s = env.reset(jax.random.PRNGKey(0), params)
    s = s.replace(grip=jnp.array([-0.9, 0.6]))  # runway before the wall
    burst = jnp.array([1.0, 0.0, -1.0])
    for t in range(10):
        _, s, _, _, _ = env.step(jax.random.PRNGKey(1), s, burst, params)
    v_after_burst = float(s.grip_vel[0])
    assert v_after_burst > 0.1
    _, s, _, _, _ = env.step(
        jax.random.PRNGKey(2), s, jnp.zeros(3), params
    )
    v_coast = float(s.grip_vel[0])
    assert 0.0 < v_coast < v_after_burst  # damped coasting, not a stop


def test_panda_pick_cartesian_has_no_momentum():
    env, params = make("PandaPickCubeCartesian")
    _, s = env.reset(jax.random.PRNGKey(0), params)
    for t in range(5):
        _, s, _, _, _ = env.step(
            jax.random.PRNGKey(1), s, jnp.array([1.0, 0.0, -1.0]), params
        )
    x0 = float(s.grip[0])
    _, s, _, _, _ = env.step(
        jax.random.PRNGKey(2), s, jnp.zeros(3), params
    )
    assert float(s.grip[0]) == x0  # velocity control: zero command = stop


def test_panda_pick_grasp_and_carry():
    env, params = make("PandaPickCube")
    _, s = env.reset(jax.random.PRNGKey(3), params)
    # teleport the gripper onto the block, close, then lift
    s = s.replace(grip=s.block, grip_vel=jnp.zeros(2))
    _, s, _, _, _ = env.step(
        jax.random.PRNGKey(4), s, jnp.array([0.0, 0.0, 1.0]), params
    )
    assert float(s.holding) == 1.0
    for t in range(12):
        _, s, _, _, _ = env.step(
            jax.random.PRNGKey(5), s, jnp.array([0.0, 1.0, 1.0]), params
        )
    assert float(s.block[1]) > 0.15  # block rose with the hand
    assert float(jnp.linalg.norm(s.block - s.grip)) < 1e-5


def test_panda_orientation_wrist_only_turns_held_block():
    env, params = make("PandaPickCubeOrientation")
    _, s = env.reset(jax.random.PRNGKey(6), params)
    yaw0 = float(s.yaw)
    # wrist command with the block NOT held: yaw must not move
    _, s, _, _, _ = env.step(
        jax.random.PRNGKey(7), s, jnp.array([0.0, 0.0, 1.0, -1.0]), params
    )
    assert float(s.yaw) == yaw0
    # grasp, then the same wrist command turns the block
    s = s.replace(grip=s.block, grip_vel=jnp.zeros(2))
    _, s, _, _, _ = env.step(
        jax.random.PRNGKey(8), s, jnp.array([0.0, 0.0, 0.0, 1.0]), params
    )
    assert float(s.holding) == 1.0
    _, s, _, _, _ = env.step(
        jax.random.PRNGKey(9), s, jnp.array([0.0, 0.0, 1.0, 1.0]), params
    )
    assert float(s.yaw) != yaw0


# --------------------------------------------------------- PushCube


def test_pushcube_untouched_cube_stays_still():
    env, params = make("PandaRobotiqPushCube")
    _, s = env.reset(jax.random.PRNGKey(10), params)
    s = s.replace(pusher=jnp.array([0.9, 0.9]), cube=jnp.zeros(2))
    cube0 = np.asarray(s.cube)
    s, _ = _roll(env, params, s, lambda t, st: jnp.zeros(2), 20)
    np.testing.assert_allclose(np.asarray(s.cube), cube0, atol=1e-6)


def test_pushcube_scripted_pushing_beats_passive():
    """Quasi-static friction makes the task solvable by a competent
    pusher: a scripted get-behind-and-push policy far outscores doing
    nothing. (At low friction the cube overshoots like an ice puck and
    the same script scored WORSE than passive — the measured
    miscalibration the friction default guards against.)"""
    env, params = make("PandaRobotiqPushCube")

    def scripted(s):
        to_tgt = s.target - s.cube
        d = jnp.linalg.norm(to_tgt) + 1e-8
        dir_t = to_tgt / d
        behind = s.cube - dir_t * 0.12
        to_behind = behind - s.pusher
        db = jnp.linalg.norm(to_behind)
        a = jnp.where(db > 0.04, to_behind / (db + 1e-8), dir_t)
        a = jnp.where(d < 0.05, a * 0.0, a)
        return jnp.clip(a * 2.0, -1, 1)

    def run(policy, seed):
        _, s = env.reset(jax.random.PRNGKey(seed), params)
        tot = 0.0
        for t in range(150):
            _, s, r, d, _ = env.step(
                jax.random.PRNGKey(1000 + t), s, policy(s), params
            )
            tot += float(r)
        return tot

    push = np.mean([run(scripted, s) for s in range(4)])
    idle = np.mean([run(lambda s: jnp.zeros(2), s) for s in range(4)])
    assert push > idle + 50.0, (push, idle)


def test_pushcube_contact_pushes_cube_away():
    env, params = make("PandaRobotiqPushCube")
    _, s = env.reset(jax.random.PRNGKey(11), params)
    # pusher just left of the cube, drive +x through it
    s = s.replace(
        pusher=jnp.array([-0.08, 0.0]), cube=jnp.zeros(2),
        cube_vel=jnp.zeros(2),
    )
    for t in range(15):
        _, s, _, _, _ = env.step(
            jax.random.PRNGKey(12), s, jnp.array([1.0, 0.0]), params
        )
    assert float(s.cube[0]) > 0.05  # cube moved in the push direction
    # friction: once the pusher stops, the slide decays to rest
    for t in range(30):
        _, s, _, _, _ = env.step(
            jax.random.PRNGKey(13), s, jnp.zeros(2), params
        )
    assert float(jnp.linalg.norm(s.cube_vel)) < 1e-2


# ---------------------------------------------------------- HandOver


def test_handover_workspace_limits():
    """Neither arm can cross the midline beyond the overlap zone — the
    property that makes the task require a hand-over."""
    env, params = make("AlohaHandOver")
    _, s = env.reset(jax.random.PRNGKey(14), params)
    for t in range(100):
        _, s, _, _, _ = env.step(
            jax.random.PRNGKey(15), s,
            jnp.array([1.0, 0.0, -1.0, -1.0, 0.0, -1.0]), params,
        )
    assert float(s.lgrip[0]) <= params.reach_overlap + 1e-6
    # left gripper can never reach the right-side target
    assert float(s.lgrip[0]) < float(s.target[0]) - 0.2


def test_handover_transfer_chain():
    """Scripted bimanual policy: left picks, carries to the midline,
    right takes possession (holder 1 -> 2) and carries on."""
    env, params = make("AlohaHandOver")
    _, s = env.reset(jax.random.PRNGKey(16), params)
    # left teleports onto the block and closes
    s = s.replace(lgrip=s.block)
    _, s, _, _, _ = env.step(
        jax.random.PRNGKey(17), s,
        jnp.array([0.0, 0.0, 1.0, 0.0, 0.0, -1.0]), params,
    )
    assert float(s.holder) == 1.0
    # both hands meet in the overlap zone; right closes -> possession moves
    meet = jnp.array([0.0, 0.6])
    s = s.replace(lgrip=meet, rgrip=meet, block=meet)
    _, s, _, _, _ = env.step(
        jax.random.PRNGKey(18), s,
        jnp.array([0.0, 0.0, 1.0, 0.0, 0.0, 1.0]), params,
    )
    assert float(s.holder) == 2.0
    # right carries toward the target; block follows the right hand
    for t in range(20):
        _, s, _, _, _ = env.step(
            jax.random.PRNGKey(19), s,
            jnp.array([0.0, 0.0, -1.0, 1.0, 0.5, 1.0]), params,
        )
    assert float(jnp.linalg.norm(s.block - s.rgrip)) < 1e-5
    assert float(s.block[0]) > 0.2


def test_handover_reward_stages_dominate():
    env, params = make("AlohaHandOver")
    _, s = env.reset(jax.random.PRNGKey(20), params)
    a = jnp.zeros(6)
    mid = jnp.array([0.0, 0.6])

    def rew(**kw):
        st = s.replace(**kw)
        _, _, r, _, _ = env.step(jax.random.PRNGKey(21), st, a, params)
        return float(r)

    r_free = rew(block=mid, holder=jnp.asarray(0.0), lgrip=mid)
    r_left = rew(block=mid, holder=jnp.asarray(1.0), lgrip=mid)
    r_right = rew(block=mid, holder=jnp.asarray(2.0), rgrip=mid)
    r_placed = rew(
        block=s.target, holder=jnp.asarray(2.0), rgrip=s.target
    )
    assert r_free < r_left < r_right < r_placed


# ------------------------------------------------------- Leap cube


def test_leap_spin_rewards_rotation_and_cone_gates_torque():
    env, params = make("LeapCubeRotateZAxis")
    _, s = env.reset(jax.random.PRNGKey(22), params)
    # zero squeeze: commanded finger motion transmits nothing
    s0 = s.replace(omega=jnp.asarray(0.0))
    _, s1, _, _, _ = env.step(
        jax.random.PRNGKey(23), s0, jnp.array([1.0, -1.0, -1.0]), params
    )
    # droop is the only torque; fingers contributed none
    _, s1_ref, _, _, _ = env.step(
        jax.random.PRNGKey(23), s0, jnp.array([0.0, 0.0, -1.0]), params
    )
    assert abs(float(s1.omega) - float(s1_ref.omega)) < 1e-6
    # full squeeze: the same command spins the block and earns reward
    s2, rs = _roll(
        env, params, s0,
        lambda t, st: jnp.array([1.0, -1.0, 1.0]), 40, key=24,
    )
    assert float(s2.omega) > 0.5
    assert float(np.asarray(rs)[-10:].mean()) > 0.0
    assert env.observation_space(params).shape == (3,)


def test_leap_reorient_is_the_target_task():
    env, params = make("LeapCubeReorient")
    assert env.observation_space(params).shape == (6,)
    assert env.task == "reorient"


# ------------------------------------------------- training + registry


@pytest.mark.slow
@pytest.mark.parametrize(
    "env_name", ["PandaPickCube", "PandaRobotiqPushCube", "AlohaHandOver"]
)
def test_ac_trains_on_manipulation(env_name):
    config = compose(
        alg="pqn_manipulation",
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


def test_registry_covers_all_52_reference_playground_tasks():
    """The COMPLETE task list of the reference's train_playground_all.sh
    (25 dm-suite + 19 locomotion + 8 manipulation) resolves through the
    registry, and the manipulation family are distinct models."""
    from purejaxql_tpu.envs.registry import registered_envs

    names = set(registered_envs())
    manipulation = [
        "AlohaHandOver", "AlohaSinglePegInsertion",
        "LeapCubeRotateZAxis", "LeapCubeReorient",
        "PandaPickCubeCartesian", "PandaRobotiqPushCube",
        "PandaPickCube", "PandaPickCubeOrientation",
    ]
    missing = [n for n in manipulation if n not in names]
    assert not missing, missing

    sigs = set()
    for n in manipulation:
        env, params = make(n)
        sigs.add(
            (env.observation_space(params).shape,
             env.action_space(params).shape)
        )
    assert len(sigs) >= 6  # distinct dynamics, not renames

    # every env steps and auto-resets under jit
    for n in manipulation:
        env, params = make(n)
        obs, s = env.reset(jax.random.PRNGKey(0), params)
        a = jnp.zeros(env.action_space(params).shape)
        obs2, s2, r, d, info = jax.jit(env.step)(
            jax.random.PRNGKey(1), s, a, params
        )
        assert obs2.shape == obs.shape and np.isfinite(float(r))
