"""Staged-API tests: stage composition, eager mode, mid-run checkpointing."""

import os

import jax
import numpy as np

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.algo.stages import make_stages, train_stepwise
from purejaxql_tpu.core.checkpoint import load_state


def stage_config(**kw):
    overrides = [f"{k}={v}" for k, v in kw.items()]
    return compose(
        alg="pqn_cartpole",
        overrides=[
            "TOTAL_TIMESTEPS=8192",
            "TOTAL_TIMESTEPS_DECAY=8192",
            "NUM_ENVS=16",
            "NUM_STEPS=32",
            "NUM_MINIBATCHES=4",
            "NUM_EPOCHS=1",
            "HIDDEN_SIZE=32",
            "TEST_NUM_ENVS=8",
        ]
        + overrides,
    )


def test_stage_shapes_compose():
    stages = make_stages(stage_config())
    rng = jax.random.PRNGKey(0)
    ts = stages.init_agent(rng)
    obs, env_state = stages.reset(rng)
    assert obs.shape == (16, 4)
    obs2, env_state2, transitions, infos = stages.rollout(ts, obs, env_state, rng)
    assert transitions.obs.shape == (32, 16, 4)
    targets = stages.compute_targets(ts, transitions)
    assert targets.shape == (32, 16)
    ts2, loss, qvals = stages.learn(ts, transitions, targets, rng)
    assert int(ts2.grad_steps) == 4  # 1 epoch x 4 minibatches
    assert np.isfinite(float(loss))
    metrics = stages.evaluate(ts2, rng)
    assert "returned_episode_returns" in metrics


def test_eager_mode_matches_jit():
    config = stage_config()
    rng = jax.random.PRNGKey(0)
    sj = make_stages(config, jit=True)
    se = make_stages(config, jit=False)
    tsj = sj.init_agent(rng)
    tse = se.init_agent(rng)
    for a, b in zip(
        jax.tree_util.tree_leaves(tsj.params), jax.tree_util.tree_leaves(tse.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_train_stepwise_runs_and_checkpoints(tmp_path):
    ckpt = os.path.join(tmp_path, "state.safetensors")
    config = stage_config()
    ts, history = train_stepwise(
        config, checkpoint_every=4, checkpoint_path=ckpt
    )
    num_updates = 8192 // (16 * 32)
    assert len(history) == num_updates
    assert os.path.exists(ckpt)
    # resume-grade: full state round-trips through the checkpoint
    stages = make_stages(config)
    template = stages.init_agent(jax.random.PRNGKey(1))
    restored = load_state(template, ckpt)
    assert int(restored.grad_steps) > 0
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(ts.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
