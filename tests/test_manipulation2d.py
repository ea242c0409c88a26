"""Contact-rich manipulation tasks (envs/classic/manipulation2d.py):
physics property tests + AC-engine training on each archetype."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.envs import make


def _run(env, params, state, actions):
    key = jax.random.PRNGKey(0)
    for a in actions:
        obs, state, reward, done, info = env.step_env(
            key, state, jnp.asarray(a, jnp.float32), params
        )
    return obs, state, reward


def test_pickplace_grasp_latches_and_carries():
    env, params = make("PickPlace-v0")
    _, state = env.reset_env(jax.random.PRNGKey(3), params)
    # teleport the gripper onto the block, then close
    state = state.replace(grip=state.block)
    _, state, _ = _run(env, params, state, [[0, 0, 1.0]])
    assert float(state.holding) == 1.0
    # carry up-right while closed: block follows the gripper
    _, state, _ = _run(env, params, state, [[1.0, 1.0, 1.0]] * 5)
    np.testing.assert_allclose(
        np.asarray(state.block), np.asarray(state.grip)
    )
    assert float(state.block[1]) > params.block_half + 0.05
    # open: the block falls back to the floor
    _, state, _ = _run(env, params, state, [[0, 0, -1.0]] * 40)
    assert float(state.holding) == 0.0
    assert abs(float(state.block[1]) - params.block_half) < 1e-5


def test_pickplace_reward_peaks_in_target():
    env, params = make("PickPlace-v0")
    _, state = env.reset_env(jax.random.PRNGKey(0), params)
    state = state.replace(grip=state.block)
    _, state, _ = _run(env, params, state, [[0, 0, 1.0]])
    far_r = float(_run(env, params, state, [[0, 0, 1.0]])[2])
    state = state.replace(grip=state.target, block=state.target)
    near_r = float(_run(env, params, state, [[0, 0, 1.0]])[2])
    assert near_r > far_r + 0.5  # in-target bonus + no place distance


def test_peginsert_table_blocks_offset_descent():
    env, params = make("PegInsert-v0")
    _, state = env.reset_env(jax.random.PRNGKey(0), params)
    # place the peg clearly off-slot above the table and push down
    state = state.replace(peg=jnp.array([state.slot_x + 0.3, params.table_z + 0.02]))
    _, idle_state, idle_r = _run(env, params, state, [[0.0, 0.0]])
    _, state, reward = _run(env, params, state, [[0.0, -1.0]] * 10)
    assert float(state.peg[1]) >= params.table_z - 1e-6  # blocked
    # the blocked push reads as a contact-force penalty vs idling in place
    assert float(reward) < float(idle_r) - 0.02

    # aligned descent enters the slot
    _, state2 = env.reset_env(jax.random.PRNGKey(1), params)
    state2 = state2.replace(peg=jnp.array([float(state2.slot_x), params.table_z + 0.02]))
    _, state2, _ = _run(env, params, state2, [[0.0, -1.0]] * 10)
    assert float(state2.peg[1]) < params.table_z - 0.05  # inserted


def test_peginsert_walls_clamp_lateral_motion():
    env, params = make("PegInsert-v0")
    _, state = env.reset_env(jax.random.PRNGKey(0), params)
    state = state.replace(peg=jnp.array([float(state.slot_x), params.table_z - 0.1]))
    _, state, _ = _run(env, params, state, [[1.0, 0.0]] * 10)
    clearance = params.slot_half - params.peg_half
    assert abs(float(state.peg[0]) - float(state.slot_x)) <= clearance + 1e-6


def test_blockrotate_friction_cone_gates_torque():
    env, params = make("BlockRotate-v0")
    _, state = env.reset_env(jax.random.PRNGKey(0), params)
    state = state.replace(theta=jnp.asarray(0.0), omega=jnp.asarray(0.0))
    # full counter-motion with ZERO squeeze: cone is 0, block stays put
    # (droop at theta=0 is zero too)
    _, s_open, _ = _run(env, params, state, [[1.0, -1.0, -1.0]] * 5)
    assert abs(float(s_open.theta)) < 1e-5
    # same command with full squeeze rotates the block
    _, s_closed, _ = _run(env, params, state, [[1.0, -1.0, 1.0]] * 5)
    assert float(s_closed.theta) > 0.01


@pytest.mark.parametrize(
    "env_name", ["PickPlace-v0", "PegInsert-v0", "BlockRotate-v0"]
)
def test_ac_trains_on_manipulation_tasks(env_name):
    from purejaxql_tpu.algo.pqn_ac import make_train

    config = compose(
        alg="pqn_manipulation",
        overrides=[
            f"ENV_NAME={env_name}",
            "TOTAL_TIMESTEPS=4096",
            "NUM_ENVS=16",
            "NUM_STEPS=16",
            "NUM_MINIBATCHES=2",
            "NUM_EPOCHS=1",
            "ACTOR_HIDDEN_SIZES=[32,32]",
            "CRITIC_HIDDEN_SIZES=[32,32]",
            "TEST_DURING_TRAINING=False",
        ],
    )
    out = jax.block_until_ready(
        jax.jit(make_train(dict(config)))(jax.random.PRNGKey(0))
    )
    assert np.isfinite(np.asarray(out["metrics"]["value_loss"])).all()


@pytest.mark.slow
def test_ac_learns_peg_insertion():
    """The AC engine masters peg insertion at a 1.2M-step budget
    (measured: -43 -> +350; BlockRotate improves -218 -> -125 and
    PickPlace -178 -> -147 on the same recipe)."""
    from purejaxql_tpu.algo.pqn_ac import make_train

    config = compose(
        alg="pqn_manipulation",
        overrides=[
            "ENV_NAME=PegInsert-v0",
            "TOTAL_TIMESTEPS=1200000",
            "NUM_ENVS=64",
            "NUM_STEPS=32",
            "NUM_MINIBATCHES=4",
            "NUM_EPOCHS=2",
            "ACTOR_HIDDEN_SIZES=[64,64]",
            "CRITIC_HIDDEN_SIZES=[64,64]",
            "TEST_DURING_TRAINING=False",
        ],
    )
    out = jax.block_until_ready(
        jax.jit(make_train(dict(config)))(jax.random.PRNGKey(0))
    )
    rets = np.asarray(out["metrics"]["returned_episode_returns"])
    n = len(rets)
    early = np.nanmean(rets[: n // 10])
    late = np.nanmean(rets[-n // 10:])
    # measured +350 late; a +100 bar leaves seed/platform headroom while
    # a non-learning run stays deep negative
    assert late > early + 100.0, (early, late)
