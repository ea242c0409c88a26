"""EXECUTED bitwise-parity cross-check against the reference implementation.

The reference engine (/root/reference/purejaxql/pqn_gymnax.py) runs
UNMODIFIED in this image: `tests/refshim/` supplies the gymnax / hydra /
omegaconf / wandb API surfaces it imports, with `gymnax.make` backed by the
in-tree CartPole. Both `make_train`s therefore train on the *same env
code*, the same composed config, and the same PRNGKey — so asserting the
trained parameters are bit-for-bit identical isolates the engine itself
(RNG split tree, scan orders, flax module init order, optimizer) as the
thing under test. This is the BASELINE.json "bitwise parity" target,
executed rather than argued (see docs/PARITY.md).
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
REFSHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refshim")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "purejaxql")),
    reason="reference checkout not mounted",
)


_SHIM_MODULES = (
    "gymnax", "craftax", "jaxmarl", "brax", "mujoco_playground",
    "hydra", "omegaconf", "wandb",
)


def _import_reference(module_name):
    """Import a reference script with the refshim packages resolvable.

    The shim packages are scrubbed from sys.path/sys.modules afterwards so
    other tests in the same session never see the no-op wandb/hydra stand-ins
    (already-imported reference modules keep their bound references)."""
    import importlib

    for p in (REFERENCE, REFSHIM):
        if p not in sys.path:
            sys.path.insert(0, p)
    try:
        return importlib.import_module(module_name)
    finally:
        for p in (REFERENCE, REFSHIM):
            if p in sys.path:
                sys.path.remove(p)
        for name in list(sys.modules):
            if name.split(".")[0] in _SHIM_MODULES:
                del sys.modules[name]


def _parity_config(overrides):
    from purejaxql_tpu.core.config import compose

    config = compose(alg="pqn_cartpole", overrides=overrides)
    # keys the reference's train() reads that our compose doesn't add
    ref_config = {
        **config,
        "WANDB_MODE": "disabled",
        "WANDB_LOG_ALL_SEEDS": False,
    }
    return config, ref_config


def _run_both(config, ref_config, num_seeds=1):
    import jax

    ref_mod = _import_reference("purejaxql.pqn_gymnax")
    from purejaxql_tpu.algo.pqn import make_train as our_make_train

    rngs = jax.random.split(jax.random.PRNGKey(config.get("SEED", 0)), num_seeds)
    ours = jax.jit(jax.vmap(our_make_train(dict(config))))(rngs)
    theirs = jax.jit(jax.vmap(ref_mod.make_train(dict(ref_config))))(rngs)
    return ours, theirs


def _assert_tree_bitwise(a_tree, b_tree):
    a_leaves = jax.tree_util.tree_leaves(a_tree)
    b_leaves = jax.tree_util.tree_leaves(b_tree)
    assert len(a_leaves) == len(b_leaves)
    for a, b in zip(a_leaves, b_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


import jax  # noqa: E402  (after the docstring-level constants)


def test_bitwise_param_parity_cartpole():
    """Same seed -> bit-identical trained params vs the reference engine."""
    config, ref_config = _parity_config(
        [
            "TOTAL_TIMESTEPS=32768",
            "TOTAL_TIMESTEPS_DECAY=32768",
            "NUM_ENVS=16",
            "NUM_STEPS=32",
            "NUM_MINIBATCHES=4",
            "NUM_EPOCHS=2",
            "HIDDEN_SIZE=64",
            "TEST_DURING_TRAINING=False",
        ]
    )
    ours, theirs = _run_both(config, ref_config)

    _assert_tree_bitwise(
        ours["runner_state"][0].params, theirs["runner_state"][0].params
    )
    # optimizer state and counters must match too (same update trajectory)
    _assert_tree_bitwise(
        ours["runner_state"][0].opt_state, theirs["runner_state"][0].opt_state
    )
    np.testing.assert_array_equal(
        np.asarray(ours["runner_state"][0].timesteps),
        np.asarray(theirs["runner_state"][0].timesteps),
    )


def test_bitwise_metric_parity_cartpole_with_eval():
    """Training metrics AND in-graph eval metrics match bit-for-bit, with
    TEST_DURING_TRAINING exercising the eval scan + lax.cond cadence."""
    config, ref_config = _parity_config(
        [
            "TOTAL_TIMESTEPS=16384",
            "TOTAL_TIMESTEPS_DECAY=16384",
            "NUM_ENVS=16",
            "NUM_STEPS=32",
            "NUM_MINIBATCHES=4",
            "NUM_EPOCHS=2",
            "HIDDEN_SIZE=64",
            "TEST_DURING_TRAINING=True",
            "TEST_NUM_ENVS=8",
            "TEST_NUM_STEPS=128",
        ]
    )
    ours, theirs = _run_both(config, ref_config)

    for key in (
        "returned_episode_returns",
        "td_loss",
        "qvals",
        "test/returned_episode_returns",
    ):
        assert key in ours["metrics"], f"ours missing {key}"
        assert key in theirs["metrics"], f"reference missing {key}"
        np.testing.assert_array_equal(
            np.asarray(ours["metrics"][key]),
            np.asarray(theirs["metrics"][key]),
            err_msg=key,
        )


def test_bitwise_param_parity_minatar_cnn():
    """CNN engine parity vs the unmodified pqn_minatar.py script: the /255
    obs scaling, dummy input BatchNorm, and MinAtarCNN init order all have
    to line up for this to pass bit-for-bit."""
    import jax as _jax
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn import make_train as our_make_train

    ref_mod = _import_reference("purejaxql.pqn_minatar")

    overrides = [
        "ENV_NAME=Breakout-MinAtar",
        "TOTAL_TIMESTEPS=8192",
        "TOTAL_TIMESTEPS_DECAY=8192",
        "NUM_ENVS=16",
        "NUM_STEPS=32",
        "NUM_MINIBATCHES=4",
        "NUM_EPOCHS=1",
        "TEST_DURING_TRAINING=False",
    ]
    config = compose(alg="pqn_minatar", overrides=overrides)
    ref_config = {
        **config,
        "WANDB_MODE": "disabled",
        "WANDB_LOG_ALL_SEEDS": False,
    }

    rngs = _jax.random.split(_jax.random.PRNGKey(0), 1)
    ours = _jax.jit(_jax.vmap(our_make_train(dict(config))))(rngs)
    theirs = _jax.jit(_jax.vmap(ref_mod.make_train(dict(ref_config))))(rngs)
    _assert_tree_bitwise(
        ours["runner_state"][0].params, theirs["runner_state"][0].params
    )


def test_bitwise_param_parity_rnn():
    """Recurrent engine parity vs the unmodified pqn_rnn_gymnax.py script:
    memory-window ring, random prefill, stored-initial-hidden-state BPTT."""
    import jax as _jax
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn_rnn import make_train as our_make_train

    ref_mod = _import_reference("purejaxql.pqn_rnn_gymnax")

    overrides = [
        "TOTAL_TIMESTEPS=8192",
        "TOTAL_TIMESTEPS_DECAY=8192",
        "NUM_ENVS=16",
        "NUM_STEPS=16",
        "MEMORY_WINDOW=4",
        "NUM_MINIBATCHES=2",
        "NUM_EPOCHS=1",
        "HIDDEN_SIZE=64",
        "TEST_DURING_TRAINING=False",
    ]
    config = compose(alg="pqn_rnn_cartpole", overrides=overrides)
    ref_config = {
        **config,
        "WANDB_MODE": "disabled",
        "WANDB_LOG_ALL_SEEDS": False,
    }

    rngs = _jax.random.split(_jax.random.PRNGKey(0), 1)
    ours = _jax.jit(_jax.vmap(our_make_train(dict(config))))(rngs)
    theirs = _jax.jit(_jax.vmap(ref_mod.make_train(dict(ref_config))))(rngs)
    _assert_tree_bitwise(
        ours["runner_state"][0].params, theirs["runner_state"][0].params
    )


def test_bitwise_param_parity_craftax_engine():
    """Craftax-engine parity vs the unmodified pqn_craftax.py script, with
    the craftax import shimmed to the in-tree Forager: exercises BatchRenorm
    (input norm + dummy), optimistic resets (shared reset pool + weighted
    choice), and the Q_LAMBDA=False 1-step-TD path — and, because the
    reference wraps the env with ITS OWN craftax_wrappers, our wrapper RNG
    discipline is under test too."""
    import jax as _jax
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn import make_train as our_make_train

    ref_mod = _import_reference("purejaxql.pqn_craftax")

    overrides = [
        "TOTAL_TIMESTEPS=2048",
        "TOTAL_TIMESTEPS_DECAY=2048",
        "NUM_ENVS=32",
        "NUM_STEPS=1",
        "NUM_MINIBATCHES=1",
        "NUM_EPOCHS=1",
        "HIDDEN_SIZE=64",
        "NUM_LAYERS=2",
        "OPTIMISTIC_RESET_RATIO=8",
        "TEST_DURING_TRAINING=False",
    ]
    config = compose(alg="pqn_craftax", overrides=overrides)
    ref_config = {
        **config,
        "WANDB_MODE": "disabled",
        "WANDB_LOG_ALL_SEEDS": False,
    }

    rngs = _jax.random.split(_jax.random.PRNGKey(0), 1)
    ours = _jax.jit(_jax.vmap(our_make_train(dict(config))))(rngs)
    theirs = _jax.jit(_jax.vmap(ref_mod.make_train(dict(ref_config))))(rngs)
    _assert_tree_bitwise(
        ours["runner_state"][0].params, theirs["runner_state"][0].params
    )
    _assert_tree_bitwise(
        ours["runner_state"][0].batch_stats,
        theirs["runner_state"][0].batch_stats,
    )


def test_bitwise_param_parity_rnn_craftax():
    """Recurrent craftax-engine parity vs the unmodified pqn_rnn_craftax.py
    script: LSTM cells, a 2-layer RNN stack, ADD_LAST_ACTION one-hot input,
    BatchRenorm input norm, the memory-window ring, AND the reference's own
    craftax_wrappers optimistic-reset path — the last reference engine in
    BASELINE.json's config list without an executed cross-check."""
    import jax as _jax
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn_rnn import make_train as our_make_train

    ref_mod = _import_reference("purejaxql.pqn_rnn_craftax")

    overrides = [
        "TOTAL_TIMESTEPS=1024",
        "TOTAL_TIMESTEPS_DECAY=1024",
        "NUM_ENVS=16",
        "NUM_STEPS=8",
        "MEMORY_WINDOW=4",
        "NUM_MINIBATCHES=2",
        "NUM_EPOCHS=1",
        "HIDDEN_SIZE=64",
        "NUM_LAYERS=1",
        "NUM_RNN_LAYERS=2",
        "OPTIMISTIC_RESET_RATIO=4",
        "TEST_DURING_TRAINING=False",
    ]
    config = compose(alg="pqn_rnn_craftax", overrides=overrides)
    ref_config = {
        **config,
        "WANDB_MODE": "disabled",
        "WANDB_LOG_ALL_SEEDS": False,
    }

    rngs = _jax.random.split(_jax.random.PRNGKey(0), 1)
    ours = _jax.jit(_jax.vmap(our_make_train(dict(config))))(rngs)
    theirs = _jax.jit(_jax.vmap(ref_mod.make_train(dict(ref_config))))(rngs)
    _assert_tree_bitwise(
        ours["runner_state"][0].params, theirs["runner_state"][0].params
    )
    _assert_tree_bitwise(
        ours["runner_state"][0].batch_stats,
        theirs["runner_state"][0].batch_stats,
    )
    _assert_tree_bitwise(
        ours["runner_state"][0].opt_state, theirs["runner_state"][0].opt_state
    )


def test_bitwise_param_parity_vdn_jaxmarl():
    """VDN-engine parity vs the unmodified pqn_vdn_rnn_jaxmarl.py script
    with the jaxmarl import shimmed to the in-tree Spread: agent-vmapped
    shared net, masked epsilon-greedy, the VDN sum in the lambda-return
    scan, agent-axis minibatch transpose, and the reference's
    unscaled-reward random prefill (REW_SCALE applies to training rollouts
    only, pqn_vdn_rnn_jaxmarl.py:288 vs :623)."""
    import copy as _copy

    import jax as _jax
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn_vdn import make_train as our_make_train

    ref_mod = _import_reference("purejaxql.pqn_vdn_rnn_jaxmarl")

    overrides = [
        "TOTAL_TIMESTEPS=2048",
        "TOTAL_TIMESTEPS_DECAY=2048",
        "NUM_ENVS=16",
        "NUM_STEPS=8",
        "MEMORY_WINDOW=4",
        "NUM_MINIBATCHES=2",
        "NUM_EPOCHS=2",
        "HIDDEN_SIZE=64",
        "NUM_LAYERS=2",
        "TEST_DURING_TRAINING=False",
    ]
    config = compose(alg="pqn_vdn_spread", overrides=overrides)
    ref_config = {
        **config,
        "ENV_NAME": "MPE_simple_spread_v3",  # shim maps this to Spread-v0
        "WANDB_MODE": "disabled",
        "WANDB_LOG_ALL_SEEDS": False,
    }
    ref_env, _ = ref_mod.env_from_config(_copy.deepcopy(ref_config))

    rngs = _jax.random.split(_jax.random.PRNGKey(0), 1)
    ours = _jax.jit(_jax.vmap(our_make_train(dict(config))))(rngs)
    theirs = _jax.jit(
        _jax.vmap(ref_mod.make_train(dict(ref_config), ref_env))
    )(rngs)
    _assert_tree_bitwise(
        ours["runner_state"][0].params, theirs["runner_state"][0].params
    )
    _assert_tree_bitwise(
        ours["runner_state"][0].opt_state, theirs["runner_state"][0].opt_state
    )
    np.testing.assert_array_equal(
        np.asarray(ours["runner_state"][0].timesteps),
        np.asarray(theirs["runner_state"][0].timesteps),
    )


def test_bitwise_param_parity_ac_playground():
    """AC-engine parity vs the unmodified pqn_mujoco_playground.py script,
    with mujoco_playground/brax shimmed to the in-tree PointMass (native
    [-1,1] action box): deterministic tanh actor + Gaussian noise (the
    reference's noise/step-key reuse discipline), vmapped critic-ensemble
    init/apply, Q(lambda) targets over ensemble-mean values, Huber critic
    loss, thresholded smooth-L1 actor penalty, and the Normalize
    Obs/Reward + LogVec + ClipAction wrapper stack on BOTH sides.

    Protocol note: brax-style envs carry reset randomness in state (no
    per-step key), the in-tree stack passes per-step keys — identical
    until an episode boundary, so this test trains strictly inside the
    first episode (128 steps/env < PointMass's 250-step horizon)."""
    import jax as _jax
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn_ac import make_train as our_make_train

    ref_mod = _import_reference("purejaxql.pqn_mujoco_playground")

    overrides = [
        "ENV_NAME=PointMass-v0",
        "TOTAL_TIMESTEPS=2048",
        "NUM_ENVS=16",
        "NUM_STEPS=16",
        "NUM_MINIBATCHES=2",
        "NUM_EPOCHS=1",
        "ACTOR_HIDDEN_SIZES=[32,32]",
        "CRITIC_HIDDEN_SIZES=[32,32]",
        "NORMALIZE_OBS=True",
        "NORMALIZE_REWARD=True",
        "TEST_DURING_TRAINING=False",
    ]
    config = compose(alg="pqn_dm_suite", overrides=overrides)
    ref_config = {
        **config,
        "ENV_NAME": "PointMass",  # shim maps to the in-tree PointMass-v0
        "WANDB_MODE": "disabled",
        "WANDB_LOG_ALL_SEEDS": False,
    }

    rngs = _jax.random.split(_jax.random.PRNGKey(0), 1)
    ours = _jax.jit(_jax.vmap(our_make_train(dict(config))))(rngs)
    theirs = _jax.jit(_jax.vmap(ref_mod.make_train(dict(ref_config))))(rngs)
    for head in ("actor", "critic"):
        _assert_tree_bitwise(
            ours["runner_state"][0][head].params,
            theirs["runner_state"][0][head].params,
        )
        _assert_tree_bitwise(
            ours["runner_state"][0][head].opt_state,
            theirs["runner_state"][0][head].opt_state,
        )


def test_bitwise_param_parity_multi_seed_vmap():
    """The seed-vmap harness preserves parity per seed."""
    config, ref_config = _parity_config(
        [
            "TOTAL_TIMESTEPS=8192",
            "TOTAL_TIMESTEPS_DECAY=8192",
            "NUM_ENVS=8",
            "NUM_STEPS=32",
            "NUM_MINIBATCHES=2",
            "NUM_EPOCHS=1",
            "HIDDEN_SIZE=32",
            "TEST_DURING_TRAINING=False",
        ]
    )
    ours, theirs = _run_both(config, ref_config, num_seeds=3)
    _assert_tree_bitwise(
        ours["runner_state"][0].params, theirs["runner_state"][0].params
    )
