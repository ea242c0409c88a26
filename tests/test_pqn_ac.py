"""AC-PQN (continuous control) trainer tests."""

import jax
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.algo.pqn_ac import make_train


def ac_config(**kw):
    overrides = [f"{k}={v}" for k, v in kw.items()]
    return compose(
        alg="pqn_pendulum",
        overrides=[
            "TOTAL_TIMESTEPS=16384",
            "NUM_ENVS=16",
            "NUM_STEPS=32",
            "NUM_MINIBATCHES=4",
            "NUM_EPOCHS=2",
            "ACTOR_HIDDEN_SIZES=[32,32]",
            "CRITIC_HIDDEN_SIZES=[32,32]",
            "TEST_DURING_TRAINING=False",
        ]
        + overrides,
    )


def run(config, seed=0):
    rngs = jax.random.split(jax.random.PRNGKey(seed), 1)
    return jax.block_until_ready(jax.jit(jax.vmap(make_train(config)))(rngs))


def test_ac_train_runs():
    outs = run(ac_config())
    m = outs["metrics"]
    assert int(np.asarray(m["env_step"][0, -1])) == 16384
    assert np.isfinite(np.asarray(m["value_loss"])).all()
    assert np.isfinite(np.asarray(m["loss_actor"])).all()


def test_ac_actions_within_bounds():
    outs = run(ac_config())
    # actor params exist for both networks
    ts = outs["runner_state"][0]
    assert "actor" in ts and "critic" in ts
    # critic ensemble has leading ensemble axis
    leaf = jax.tree_util.tree_leaves(ts["critic"].params)[0]
    assert leaf.shape[1] == 2 or leaf.shape[0] == 1  # (seeds, ensemble, ...)


def test_ac_one_step_td_path():
    outs = run(ac_config(USE_QLAMBDA=False))
    assert np.isfinite(np.asarray(outs["metrics"]["value_loss"])).all()


def test_ac_normalize_wrappers():
    outs = run(ac_config(NORMALIZE_OBS=True, NORMALIZE_REWARD=True))
    assert np.isfinite(np.asarray(outs["metrics"]["value_loss"])).all()


def test_ac_deterministic():
    config = ac_config()
    a = run(config)
    b = run(config)
    for x, y in zip(
        jax.tree_util.tree_leaves(a["runner_state"][0]["actor"].params),
        jax.tree_util.tree_leaves(b["runner_state"][0]["actor"].params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_ac_learns_pendulum():
    """Pendulum should improve from ~-1400 toward > -500 test return."""
    config = compose(
        alg="pqn_pendulum", overrides=["TOTAL_TIMESTEPS=400000"]
    )
    outs = run(config)
    tr = np.asarray(outs["metrics"]["test/returned_episode_returns"][0])
    # greedy eval must clearly beat the random baseline (~-1300) at its
    # best checkpoint (late-run noise-ladder exploration adds variance)
    assert tr.max() > -500, tr


@pytest.mark.slow
def test_ac_learns_reacher():
    """Reacher (2-joint arm) should improve clearly: random ~-129, expect
    best test return above -70 within 400k steps."""
    config = compose(alg="pqn_reacher", overrides=["TOTAL_TIMESTEPS=400000"])
    outs = run(config)
    tr = np.asarray(outs["metrics"]["test/returned_episode_returns"][0])
    assert tr.max() > -70, tr
