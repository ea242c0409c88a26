"""Kitchen (Overcooked-class) env tests: scripted cook-and-deliver,
action masks, counter passing, and VDN training over the env."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.envs.marl import make_marl
from purejaxql_tpu.envs.marl.kitchen import (
    A_DOWN, A_INTERACT, A_LEFT, A_NOOP, A_RIGHT, A_UP, H_ONION, H_PLATE,
    H_SOUP,
)
from purejaxql_tpu.algo.pqn_vdn import make_train


def _run_script(env, script, key=0):
    """Step agent_0 through `script` (agent_1 noops); returns reward sum
    and the trace of (held0, pot_onions, reward)."""
    obs, state = env.reset(jax.random.PRNGKey(key))
    total = 0.0
    trace = []
    for t, a0 in enumerate(script):
        actions = {"agent_0": jnp.asarray(a0), "agent_1": jnp.asarray(A_NOOP)}
        obs, state, r, d, _ = env.step(jax.random.PRNGKey(t), state, actions)
        total += float(r["__all__"])
        trace.append(
            (int(state.held[0]), int(state.pot_onions[0]), float(r["__all__"]))
        )
    return total, trace, state


def test_scripted_cook_and_deliver():
    """A hand-scripted agent completes the full loop in cramped_room:
    3 onions -> pot cooks -> scoop with plate -> deliver for +20."""
    env = make_marl("Kitchen-v0", layout="cramped_room", shaped_rewards=False)

    onion_cycle1 = [A_LEFT, A_INTERACT, A_RIGHT, A_UP, A_INTERACT]
    onion_cycle = [A_LEFT, A_LEFT, A_INTERACT, A_RIGHT, A_UP, A_INTERACT]
    fetch_plate = [A_DOWN, A_LEFT, A_DOWN, A_INTERACT]
    wait = [A_NOOP] * 20
    back_to_pot = [A_UP, A_RIGHT, A_UP, A_INTERACT]
    deliver = [A_DOWN, A_RIGHT, A_DOWN, A_INTERACT]

    script = (
        onion_cycle1 + onion_cycle + onion_cycle
        + fetch_plate + wait + back_to_pot + deliver
    )
    total, trace, state = _run_script(env, script)

    held_after_first_take = trace[1][0]
    assert held_after_first_take == H_ONION
    pot_after_third = trace[len(onion_cycle1) + 2 * len(onion_cycle) - 1][1]
    assert pot_after_third == 3
    plate_step = len(onion_cycle1) + 2 * len(onion_cycle) + len(fetch_plate)
    assert trace[plate_step - 1][0] == H_PLATE
    soup_step = plate_step + len(wait) + len(back_to_pot)
    assert trace[soup_step - 1][0] == H_SOUP
    assert total == 20.0, [x for x in trace if x[2] != 0]


def test_action_masks_block_walls():
    env = make_marl("Kitchen-v0", layout="cramped_room")
    obs, state = env.reset(jax.random.PRNGKey(0))
    mask = env.get_avail_actions(state)["agent_0"]
    # agent_0 starts at (1,1): up is wall, left is onion pile, down+right
    # are floor; noop/interact always legal
    np.testing.assert_array_equal(
        np.asarray(mask), [0.0, 1.0, 0.0, 1.0, 1.0, 1.0]
    )


def test_counter_pass():
    """Items can be placed on and picked from counters (the coordination
    mechanic asymmetric layouts rely on)."""
    env = make_marl("Kitchen-v0", layout="cramped_room")
    # take an onion, place it on the counter below-left, pick it back up
    script = [
        A_LEFT, A_INTERACT,      # take onion
        A_DOWN,                  # (2,1)
        A_DOWN,                  # blocked by plate pile? (3,1)=D -> face down
        A_LEFT, A_INTERACT,      # face counter (2,0)=X, place onion
        A_INTERACT,              # pick it back
    ]
    total, trace, state = _run_script(env, script)
    assert trace[1][0] == H_ONION
    assert trace[5][0] == 0  # placed
    assert trace[6][0] == H_ONION  # picked back


def test_movement_collisions():
    """Simultaneous same-target moves are blocked (overcooked rule)."""
    env = make_marl("Kitchen-v0", layout="cramped_room")
    obs, state = env.reset(jax.random.PRNGKey(0))
    # agent_0 at (1,1) moves right, agent_1 at (1,3) moves left -> both
    # target (1,2): neither moves
    actions = {"agent_0": jnp.asarray(A_RIGHT), "agent_1": jnp.asarray(A_LEFT)}
    obs, state, r, d, _ = env.step(jax.random.PRNGKey(1), state, actions)
    np.testing.assert_array_equal(np.asarray(state.pos), [[1, 1], [1, 3]])


def test_horizon_auto_reset():
    env = make_marl("Kitchen-v0", layout="coord_ring", max_steps=10)
    obs, state = env.reset(jax.random.PRNGKey(0))
    for t in range(10):
        actions = {a: jnp.asarray(A_NOOP) for a in env.agents}
        obs, state, r, d, _ = env.step(jax.random.PRNGKey(t), state, actions)
    assert int(state.time) == 0  # reset fired at the horizon


def test_all_layouts_build_and_step():
    for layout in ["cramped_room", "coord_ring", "asymmetric_pass"]:
        env = make_marl("Kitchen-v0", layout=layout)
        obs, state = env.reset(jax.random.PRNGKey(0))
        assert obs["agent_0"].shape == (env.obs_dim,)
        actions = {a: jnp.asarray(A_UP) for a in env.agents}
        obs, state, r, d, _ = env.step(jax.random.PRNGKey(1), state, actions)
        assert np.isfinite(np.asarray(obs["agent_0"])).all()


def test_vdn_trains_on_kitchen():
    config = compose(
        alg="pqn_vdn_kitchen",
        overrides=[
            "TOTAL_TIMESTEPS=16384", "TOTAL_TIMESTEPS_DECAY=16384",
            "NUM_ENVS=16", "NUM_STEPS=32", "MEMORY_WINDOW=4",
            "NUM_MINIBATCHES=2", "NUM_EPOCHS=1", "HIDDEN_SIZE=32",
            "TEST_DURING_TRAINING=False",
        ],
    )
    outs = jax.block_until_ready(
        jax.jit(make_train(config))(jax.random.PRNGKey(0))
    )
    assert np.isfinite(np.asarray(outs["metrics"]["td_loss"])).all()


@pytest.mark.slow
def test_vdn_learns_kitchen():
    """Learning evidence: shaped team returns improve under VDN-RNN-PQN on
    cramped_room. The run is deterministic per backend but the trajectory
    diverges across backends (TPU matmuls accumulate differently): on the
    chip this config reaches ~173 by 2M steps (sustained soup deliveries);
    on the CPU test mesh the same program reaches ~8 from an early ~3.2.
    Assert the backend-independent part — a clear upward trend — and the
    strong on-chip threshold only when a TPU is present."""
    config = compose(
        alg="pqn_vdn_kitchen",
        overrides=[
            "TOTAL_TIMESTEPS=2000000", "TOTAL_TIMESTEPS_DECAY=2000000",
            "NUM_ENVS=64", "TEST_NUM_ENVS=32", "TEST_DURING_TRAINING=False",
        ],
    )
    outs = jax.block_until_ready(
        jax.jit(make_train(config))(jax.random.PRNGKey(0))
    )
    rets = np.asarray(outs["metrics"]["returned_episode_returns"])
    early, late = rets[: len(rets) // 10].mean(), rets[-len(rets) // 10 :].mean()
    assert late > 2.0 * early and late > 6.0, (early, late)
    if jax.default_backend() not in ("cpu",):
        assert late > 50.0, (early, late)
