"""Executable parity cross-check against the reference implementation.

Runs ONLY when the reference's dependencies (gymnax + the reference repo)
are importable — they are not in the build image, so this auto-skips here;
on a machine with them installed it executes the PARITY.md contract:
identical seed -> identical trained parameters, bit for bit, on the
CartPole config (engine RNG tree + env dynamics parity).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

_have_gymnax = importlib.util.find_spec("gymnax") is not None
_have_reference = os.path.isdir(os.path.join(REFERENCE, "purejaxql"))

pytestmark = pytest.mark.skipif(
    not (_have_gymnax and _have_reference),
    reason="reference deps (gymnax) not installed in this image",
)


def test_bitwise_param_parity_cartpole():
    import jax

    sys.path.insert(0, REFERENCE)
    from purejaxql.pqn_gymnax import make_train as ref_make_train

    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn import make_train as our_make_train

    overrides = [
        "TOTAL_TIMESTEPS=16384", "TOTAL_TIMESTEPS_DECAY=16384",
        "NUM_ENVS=16", "NUM_STEPS=32", "NUM_MINIBATCHES=4", "NUM_EPOCHS=2",
        "TEST_DURING_TRAINING=False",
    ]
    config = compose(alg="pqn_cartpole", overrides=overrides)
    ref_config = {**config, "WANDB_MODE": "disabled"}

    rngs = jax.random.split(jax.random.PRNGKey(0), 1)
    ours = jax.jit(jax.vmap(our_make_train(config)))(rngs)
    theirs = jax.jit(jax.vmap(ref_make_train(dict(ref_config))))(rngs)

    our_params = jax.tree_util.tree_leaves(ours["runner_state"][0].params)
    ref_params = jax.tree_util.tree_leaves(theirs["runner_state"][0].params)
    assert len(our_params) == len(ref_params)
    for a, b in zip(our_params, ref_params):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
