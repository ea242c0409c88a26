"""RNN-PQN trainer tests: variants run, determinism, memory actually used."""

import jax
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.algo.pqn_rnn import make_train as make_train_rnn
from purejaxql_tpu.algo.pqn import make_train as make_train_ff


def tiny_rnn_config(**kw):
    overrides = [f"{k}={v}" for k, v in kw.items()]
    return compose(
        alg="pqn_rnn_cartpole",
        overrides=[
            "TOTAL_TIMESTEPS=8192",
            "TOTAL_TIMESTEPS_DECAY=8192",
            "NUM_ENVS=16",
            "NUM_STEPS=32",
            "NUM_MINIBATCHES=4",
            "NUM_EPOCHS=2",
            "HIDDEN_SIZE=32",
            "TEST_DURING_TRAINING=False",
        ]
        + overrides,
    )


def run(make_train, config, seed=0, num_seeds=1):
    rngs = jax.random.split(jax.random.PRNGKey(seed), num_seeds)
    return jax.block_until_ready(jax.jit(jax.vmap(make_train(config)))(rngs))


def test_rnn_train_runs():
    outs = run(make_train_rnn, tiny_rnn_config())
    m = outs["metrics"]
    assert int(np.asarray(m["env_step"][0, -1])) == 8192
    assert np.isfinite(np.asarray(m["td_loss"])).all()


def test_rnn_lstm_multilayer_dueling():
    config = tiny_rnn_config(
        RNN_CELL="lstm",
        NUM_RNN_LAYERS=2,
        DUELING=True,
        NORM_TYPE="batch_norm",
        NORM_INPUT=True,
    )
    outs = run(make_train_rnn, config)
    assert np.isfinite(np.asarray(outs["metrics"]["td_loss"])).all()


def test_rnn_memory_window():
    config = tiny_rnn_config(MEMORY_WINDOW=8)
    outs = run(make_train_rnn, config)
    assert np.isfinite(np.asarray(outs["metrics"]["td_loss"])).all()


def test_rnn_deterministic():
    config = tiny_rnn_config()
    a = run(make_train_rnn, config)
    b = run(make_train_rnn, config)
    for x, y in zip(
        jax.tree_util.tree_leaves(a["runner_state"][0].params),
        jax.tree_util.tree_leaves(b["runner_state"][0].params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_rnn_solves_memory_task_ff_does_not():
    """The defining capability test: on MemoryChain the recurrent agent
    reaches near-perfect recall while the feedforward agent stays at
    chance (return <= ~0.3)."""
    rnn_config = compose(
        alg="pqn_rnn_memory_chain", overrides=["TEST_NUM_STEPS=64"]
    )
    outs = run(make_train_rnn, rnn_config)
    rnn_final = np.asarray(
        outs["metrics"]["test/returned_episode_returns"][0, -3:]
    ).mean()
    assert rnn_final > 0.8, rnn_final

    ff_config = compose(
        alg="pqn_rnn_memory_chain",
        overrides=["TEST_NUM_STEPS=64", "ALG_NAME=pqn"],
    )
    outs = run(make_train_ff, ff_config)
    ff_final = np.asarray(
        outs["metrics"]["test/returned_episode_returns"][0, -3:]
    ).mean()
    assert ff_final < 0.5, ff_final
