"""VDN multi-agent trainer + Spread env tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.envs.marl import make_marl
from purejaxql_tpu.envs.marl.base import CTRolloutManager, MARLLogWrapper
from purejaxql_tpu.algo.pqn_vdn import make_train


def test_spread_env_protocol():
    env = make_marl("Spread-v0", num_agents=3)
    obs, state = env.reset(jax.random.PRNGKey(0))
    assert set(obs) == {"agent_0", "agent_1", "agent_2"}
    actions = {a: jnp.asarray(1) for a in env.agents}
    obs, state, rewards, dones, info = env.step(
        jax.random.PRNGKey(1), state, actions
    )
    assert "__all__" in rewards and "__all__" in dones
    # cooperative: identical team reward for every agent
    assert float(rewards["agent_0"]) == float(rewards["__all__"])
    assert float(rewards["__all__"]) <= 0.0  # negative-distance reward


def test_spread_episode_ends_at_horizon():
    env = make_marl("Spread-v0")
    obs, state = env.reset(jax.random.PRNGKey(0))
    actions = {a: jnp.asarray(0) for a in env.agents}
    done_seen = False
    for t in range(25):
        obs, state, r, d, _ = env.step(jax.random.PRNGKey(t), state, actions)
        done_seen = done_seen or bool(d["__all__"])
    assert done_seen
    assert int(state.time) == 0  # auto-reset


def test_ct_rollout_manager_batching():
    env = MARLLogWrapper(make_marl("Spread-v0"))
    mgr = CTRolloutManager(env, batch_size=8)
    obs, state = mgr.batch_reset(jax.random.PRNGKey(0))
    assert obs["agent_0"].shape[0] == 8
    avail = mgr.get_valid_actions(state)
    assert avail["agent_0"].shape == (8, 5)
    actions = {a: jnp.zeros(8, jnp.int32) for a in env.agents}
    obs, state, rewards, dones, info = mgr.batch_step(
        jax.random.PRNGKey(1), state, actions
    )
    assert rewards["__all__"].shape == (8,)
    assert "returned_episode_returns" in info


def vdn_config(**kw):
    overrides = [f"{k}={v}" for k, v in kw.items()]
    return compose(
        alg="pqn_vdn_spread",
        overrides=[
            "TOTAL_TIMESTEPS=20000",
            "NUM_ENVS=16",
            "NUM_STEPS=25",
            "NUM_MINIBATCHES=4",
            "NUM_EPOCHS=1",
            "HIDDEN_SIZE=32",
            "TEST_DURING_TRAINING=False",
        ]
        + overrides,
    )


def test_vdn_train_runs():
    config = vdn_config()
    rngs = jax.random.split(jax.random.PRNGKey(0), 1)
    outs = jax.block_until_ready(jax.jit(jax.vmap(make_train(config)))(rngs))
    m = outs["metrics"]
    assert int(np.asarray(m["env_step"][0, -1])) == 20000
    assert np.isfinite(np.asarray(m["td_loss"])).all()


def test_vdn_deterministic():
    config = vdn_config()
    rngs = jax.random.split(jax.random.PRNGKey(0), 1)
    fn = jax.jit(jax.vmap(make_train(config)))
    a = jax.block_until_ready(fn(rngs))
    b = jax.block_until_ready(fn(rngs))
    for x, y in zip(
        jax.tree_util.tree_leaves(a["runner_state"][0].params),
        jax.tree_util.tree_leaves(b["runner_state"][0].params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_vdn_learns_spread():
    """Team return should improve clearly over training on Spread."""
    config = compose(
        alg="pqn_vdn_spread",
        overrides=[
            "TOTAL_TIMESTEPS=400000",
            "NUM_ENVS=64",
            "HIDDEN_SIZE=128",
            "TEST_DURING_TRAINING=False",
        ],
    )
    rngs = jax.random.split(jax.random.PRNGKey(0), 1)
    outs = jax.block_until_ready(jax.jit(jax.vmap(make_train(config)))(rngs))
    rets = np.asarray(outs["metrics"]["returned_episode_returns"][0])
    early = rets[: max(1, len(rets) // 10)].mean()
    late = rets[-max(1, len(rets) // 10):].mean()
    assert late > early + 3.0, (early, late)
