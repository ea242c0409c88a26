"""Golden determinism guards.

Bitwise parity with the reference (BASELINE.json) hinges on the exact
jax.random split tree and scan orders (SURVEY.md §2.5 #13). These tests
pin our own RNG discipline to recorded golden values so refactors cannot
silently reorder a split: any change to the split tree, env dynamics,
initializer order, or minibatch permutation shows up as a golden mismatch
here before it shows up as a parity break against the reference.

Golden values were recorded on the CPU backend (threefry is
backend-deterministic) at the commit that introduced this file; update
them ONLY with an explicit parity-impact note in the commit message.
"""

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.algo.pqn import make_train


def _fingerprint(tree) -> float:
    """Order-stable scalar fingerprint of a pytree."""
    leaves = jax.tree_util.tree_leaves(tree)
    return float(
        sum(np.float64(np.asarray(l, np.float64).sum()) for l in leaves)
    )


GOLDEN_CONFIG = [
    "TOTAL_TIMESTEPS=4096",
    "TOTAL_TIMESTEPS_DECAY=4096",
    "NUM_ENVS=8",
    "NUM_STEPS=16",
    "NUM_MINIBATCHES=2",
    "NUM_EPOCHS=1",
    "HIDDEN_SIZE=16",
    "TEST_DURING_TRAINING=False",
]


def test_env_reset_golden():
    """CartPole reset under a fixed key produces pinned values."""
    from purejaxql_tpu.envs import make

    env, params = make("CartPole-v1")
    obs, state = env.reset(jax.random.PRNGKey(42), params)
    np.testing.assert_allclose(
        np.asarray(obs),
        [-0.00112904, 0.01797972, 0.01162715, 0.00610161],
        rtol=1e-5, atol=1e-6,
    )


def test_split_tree_golden():
    """The train fn's RNG consumption is pinned: same seed -> same
    fingerprints of params and rollout outcomes."""
    config = compose(alg="pqn_cartpole", overrides=GOLDEN_CONFIG)
    rngs = jax.random.split(jax.random.PRNGKey(0), 1)
    outs = jax.block_until_ready(jax.jit(jax.vmap(make_train(config)))(rngs))

    fp_params = _fingerprint(outs["runner_state"][0].params)
    fp_loss = float(np.asarray(outs["metrics"]["td_loss"], np.float64).sum())
    ret_last = float(np.asarray(outs["metrics"]["returned_episode_returns"])[0, -1])

    # Golden values recorded 2026-08-17 (jax 0.9.0, CPU threefry).
    np.testing.assert_allclose(fp_params, 34.733590851950794, rtol=1e-5)
    np.testing.assert_allclose(fp_loss, 8.127119854092598, rtol=1e-4)
    np.testing.assert_allclose(ret_last, 10.859375, rtol=1e-5)


def test_eps_greedy_split_golden():
    """The eps-greedy key discipline (split into [action, coin] per env)
    is pinned to recorded actions."""
    from purejaxql_tpu.algo.exploration import eps_greedy_batch

    q_vals = jnp.arange(12.0).reshape(4, 3)
    actions = eps_greedy_batch(
        jax.random.PRNGKey(7), q_vals, jnp.full((4,), 0.5)
    )
    np.testing.assert_array_equal(np.asarray(actions), [2, 0, 2, 2])
