"""End-to-end FF-PQN training tests on the CPU mesh: determinism, learning,
multi-seed vmap, craftax-style batched path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.algo.pqn import make_train


def tiny_config(**kw):
    overrides = [f"{k}={v}" for k, v in kw.items()]
    return compose(
        alg="pqn_cartpole",
        overrides=[
            "TOTAL_TIMESTEPS=16384",
            "TOTAL_TIMESTEPS_DECAY=16384",
            "NUM_ENVS=16",
            "NUM_STEPS=32",
            "NUM_MINIBATCHES=4",
            "NUM_EPOCHS=2",
            "TEST_DURING_TRAINING=False",
            "HIDDEN_SIZE=64",
        ]
        + overrides,
    )


def run(config, seed=0, num_seeds=1):
    rngs = jax.random.split(jax.random.PRNGKey(seed), num_seeds)
    return jax.block_until_ready(jax.jit(jax.vmap(make_train(config)))(rngs))


def test_train_runs_and_counts_steps():
    config = tiny_config()
    outs = run(config)
    m = outs["metrics"]
    assert int(m["env_step"][0, -1]) == 16384
    assert np.isfinite(np.asarray(m["td_loss"])).all()


def test_train_deterministic():
    config = tiny_config()
    a = run(config)
    b = run(config)
    pa = jax.tree_util.tree_leaves(a["runner_state"][0].params)
    pb = jax.tree_util.tree_leaves(b["runner_state"][0].params)
    for x, y in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_seed_changes_trajectory():
    config = tiny_config()
    a = run(config, seed=0)
    b = run(config, seed=1)
    ra = float(np.asarray(a["metrics"]["td_loss"]).sum())
    rb = float(np.asarray(b["metrics"]["td_loss"]).sum())
    assert ra != rb


def test_multi_seed_vmap():
    config = tiny_config()
    outs = run(config, num_seeds=3)
    assert outs["metrics"]["td_loss"].shape[0] == 3
    # different seeds diverge
    losses = np.asarray(outs["metrics"]["td_loss"]).sum(axis=1)
    assert len(set(losses.round(6).tolist())) == 3


@pytest.mark.slow
def test_cartpole_learns():
    """Quarter-length CartPole run must clearly beat the random baseline
    (~20 return): expect >100 mean training return near the end."""
    config = compose(
        alg="pqn_cartpole",
        overrides=[
            "TOTAL_TIMESTEPS=200000",
            "TOTAL_TIMESTEPS_DECAY=200000",
            "TEST_DURING_TRAINING=False",
        ],
    )
    outs = run(config)
    rets = np.asarray(outs["metrics"]["returned_episode_returns"][0])
    assert rets[-10:].mean() > 100, rets[-10:]


@pytest.mark.slow
def test_catch_learns_to_perfect():
    """FF-PQN solves Catch (bsuite) outright: greedy test returns reach
    the perfect +1 catch rate within 200k steps (random ~ -0.2)."""
    config = compose(
        alg="pqn_cartpole",
        overrides=[
            "ENV_NAME=Catch-bsuite", "TOTAL_TIMESTEPS=200000",
            "TOTAL_TIMESTEPS_DECAY=200000", "NUM_ENVS=32",
            "TEST_NUM_ENVS=32", "EPS_FINISH=0.01",
        ],
    )
    outs = jax.block_until_ready(
        jax.jit(make_train(config))(jax.random.PRNGKey(0))
    )
    rets = np.asarray(outs["metrics"]["test/returned_episode_returns"])
    assert rets[-3:].mean() > 0.95, rets[-5:]


def test_batch_norm_path():
    config = tiny_config(NORM_TYPE="batch_norm", NORM_INPUT=True)
    outs = run(config)
    bs = outs["runner_state"][0].batch_stats
    assert jax.tree_util.tree_leaves(bs)  # running stats exist and updated


def test_craftax_style_batched_path():
    """Optimistic resets + 1-step TD (Q_LAMBDA=False), the pqn_craftax mode."""
    config = tiny_config(
        USE_OPTIMISTIC_RESETS=True,
        OPTIMISTIC_RESET_RATIO=4,
        Q_LAMBDA=False,
    )
    outs = run(config)
    m = outs["metrics"]
    assert int(m["env_step"][0, -1]) == 16384
    assert np.isfinite(np.asarray(m["td_loss"])).all()


def test_in_graph_eval():
    config = tiny_config(TEST_DURING_TRAINING=True, TEST_NUM_ENVS=8, TEST_INTERVAL=0.25)
    outs = run(config)
    assert "test/returned_episode_returns" in outs["metrics"]
    vals = np.asarray(outs["metrics"]["test/returned_episode_returns"][0])
    assert np.isfinite(vals[-1])


@pytest.mark.slow
def test_acrobot_learns():
    """Acrobot (the reference's second gymnax env) reaches the solved
    region (~-90 test return; random ~-490)."""
    config = compose(
        alg="pqn_cartpole",
        overrides=[
            "ENV_NAME=Acrobot-v1",
            "TOTAL_TIMESTEPS=300000",
            "TOTAL_TIMESTEPS_DECAY=300000",
        ],
    )
    outs = run(config)
    tr = np.asarray(outs["metrics"]["test/returned_episode_returns"][0])
    assert tr[-5:].mean() > -160, tr[-10:]


def test_eval_subsample_identical_params():
    """EVAL_SUBSAMPLE only shrinks the eval env batch: the training RNG
    stream and every parameter update are bit-identical to subsample=1."""
    base = tiny_config(
        TEST_DURING_TRAINING=True, TEST_NUM_ENVS=32, TEST_NUM_STEPS=64
    )
    sub = tiny_config(
        TEST_DURING_TRAINING=True, TEST_NUM_ENVS=32, TEST_NUM_STEPS=64,
        EVAL_SUBSAMPLE=4,
    )
    a = run(base)
    b = run(sub)
    for x, y in zip(
        jax.tree_util.tree_leaves(a["runner_state"][0].params),
        jax.tree_util.tree_leaves(b["runner_state"][0].params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # eval itself ran with fewer envs but still produced finite returns
    tr = np.asarray(b["metrics"]["test/returned_episode_returns"][0])
    assert np.isfinite(tr[-1])
