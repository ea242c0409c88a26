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
