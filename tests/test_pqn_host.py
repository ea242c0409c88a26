"""End-to-end training over the C++ host env pool (EnvPool-style path)."""

import shutil

import jax
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose

pytestmark = pytest.mark.skipif(
    shutil.which("make") is None or shutil.which("g++") is None,
    reason="native toolchain unavailable",
)


def test_host_train_runs():
    from purejaxql_tpu.algo.pqn_host import make_train

    config = compose(
        alg="pqn_cartpole",
        overrides=[
            "TOTAL_TIMESTEPS=16384", "TOTAL_TIMESTEPS_DECAY=16384",
            "NUM_ENVS=32", "NUM_STEPS=16", "NUM_MINIBATCHES=4",
            "NUM_EPOCHS=1", "HIDDEN_SIZE=32", "TEST_DURING_TRAINING=False",
        ],
    )
    outs = jax.block_until_ready(
        jax.jit(make_train(config))(jax.random.PRNGKey(0))
    )
    m = outs["metrics"]
    assert int(np.asarray(m["env_step"])[-1]) == 16384
    assert np.isfinite(np.asarray(m["td_loss"])).all()


@pytest.mark.slow
def test_host_train_learns():
    """Episode lengths must grow (done rate must fall) on host CartPole."""
    from purejaxql_tpu.algo.pqn_host import make_train

    config = compose(
        alg="pqn_cartpole",
        overrides=[
            "TOTAL_TIMESTEPS=200000", "TOTAL_TIMESTEPS_DECAY=200000",
            "NUM_ENVS=64", "NUM_STEPS=32", "NUM_MINIBATCHES=8",
            "NUM_EPOCHS=2", "TEST_DURING_TRAINING=False",
        ],
    )
    outs = jax.block_until_ready(
        jax.jit(make_train(config))(jax.random.PRNGKey(0))
    )
    dr = np.asarray(outs["metrics"]["done_rate"])
    early = dr[: len(dr) // 10].mean()   # ~1/20 for random play
    late = dr[-len(dr) // 10:].mean()
    assert late < early / 2, (early, late)


def test_host_inline_eval_envs():
    """TEST_DURING_TRAINING rides TEST_ENVS greedy (eps=0) envs in the
    same pool, stripped from the learn batch (pqn_atari.py:229-263), and
    reports episodic returns for both populations plus the
    human-normalized score when the game is in the published table."""
    from purejaxql_tpu.algo.pqn_host import make_train

    config = compose(
        alg="pqn_cartpole",
        overrides=[
            "TOTAL_TIMESTEPS=8192", "TOTAL_TIMESTEPS_DECAY=8192",
            "NUM_ENVS=16", "NUM_STEPS=32", "NUM_MINIBATCHES=2",
            "NUM_EPOCHS=1", "HIDDEN_SIZE=32",
            "TEST_DURING_TRAINING=True", "TEST_ENVS=8",
            "SCORE_GAME=Breakout-v5",  # exercise the normalized-score path
        ],
    )
    outs = jax.block_until_ready(
        jax.jit(make_train(config))(jax.random.PRNGKey(0))
    )
    m = outs["metrics"]
    # timesteps count TRAIN envs only (16 x 32 x updates)
    assert int(np.asarray(m["env_step"])[-1]) == 8192
    for k in (
        "returned_episode_returns",
        "test/returned_episode_returns",
        "test/returned_episode_lengths",
        "test/human_normalized_score",
    ):
        assert k in m, sorted(m)
        assert np.isfinite(np.asarray(m[k])).all(), k
    # CartPole episodes terminate well within the run: returns are
    # populated (>0) by the end for both populations
    assert np.asarray(m["returned_episode_returns"])[-1] > 0
    assert np.asarray(m["test/returned_episode_returns"])[-1] > 0
    # normalized score is an affine map of the test return
    from purejaxql_tpu.utils.atari_scores import ATARI_SCORES

    rnd, hum = ATARI_SCORES["Breakout-v5"]
    np.testing.assert_allclose(
        np.asarray(m["test/human_normalized_score"]),
        (np.asarray(m["test/returned_episode_returns"]) - rnd) / (hum - rnd),
        rtol=1e-5,
    )
