"""SPMD sharding for the recurrent / multi-agent / actor-critic families:
every trainer accepts pmap_axis and runs under shard_map on the CPU mesh."""

import jax
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.parallel.mesh import make_mesh
from purejaxql_tpu.parallel.spmd import make_train_spmd
from purejaxql_tpu.algo import pqn_rnn, pqn_vdn, pqn_ac

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs8
def test_spmd_rnn():
    config = compose(
        alg="pqn_rnn_cartpole",
        overrides=[
            "TOTAL_TIMESTEPS=8192", "TOTAL_TIMESTEPS_DECAY=8192",
            "NUM_ENVS=32", "NUM_STEPS=16", "NUM_MINIBATCHES=2",
            "NUM_EPOCHS=1", "HIDDEN_SIZE=32", "TEST_DURING_TRAINING=False",
            "MEMORY_WINDOW=2",
        ],
    )
    mesh = make_mesh(env=8)
    out = jax.block_until_ready(
        make_train_spmd(config, mesh, make_train=pqn_rnn.make_train)(
            jax.random.PRNGKey(0)
        )
    )
    assert int(np.asarray(out["train_state"].timesteps)) == 8192
    assert np.isfinite(np.asarray(out["metrics"]["td_loss"])).all()
    # learner replicas in lockstep
    leaf = jax.tree_util.tree_leaves(out["train_state"].params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


@needs8
def test_spmd_vdn():
    config = compose(
        alg="pqn_vdn_spread",
        overrides=[
            "TOTAL_TIMESTEPS=10000", "NUM_ENVS=16", "NUM_STEPS=25",
            "NUM_MINIBATCHES=2", "NUM_EPOCHS=1", "HIDDEN_SIZE=32",
            "TEST_DURING_TRAINING=False", "TEST_NUM_ENVS=8",
        ],
    )
    mesh = make_mesh(env=8)
    out = jax.block_until_ready(
        make_train_spmd(config, mesh, make_train=pqn_vdn.make_train)(
            jax.random.PRNGKey(0)
        )
    )
    assert np.isfinite(np.asarray(out["metrics"]["td_loss"])).all()


@needs8
def test_spmd_ac():
    config = compose(
        alg="pqn_pendulum",
        overrides=[
            "TOTAL_TIMESTEPS=16384", "NUM_ENVS=16", "NUM_STEPS=32",
            "NUM_MINIBATCHES=2", "NUM_EPOCHS=1",
            "ACTOR_HIDDEN_SIZES=[32,32]", "CRITIC_HIDDEN_SIZES=[32,32]",
            "TEST_DURING_TRAINING=False", "TEST_NUM_ENVS=16",
        ],
    )
    mesh = make_mesh(env=8)

    def body(rng):
        train = pqn_ac.make_train(
            {**config, "NUM_ENVS": config["NUM_ENVS"] // 8,
             "TOTAL_TIMESTEPS": config["TOTAL_TIMESTEPS"] // 8,
             "TEST_NUM_ENVS": 2, "TIMESTEP_SCALE": 8},
            pmap_axis="env",
        )
        out = train(rng)
        return {
            "actor": out["runner_state"][0]["actor"].params,
            "value_loss": out["metrics"]["value_loss"],
        }

    from jax.sharding import PartitionSpec as P

    fn = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=P(), out_specs=P(),
                      check_vma=False)
    )
    out = jax.block_until_ready(fn(jax.random.PRNGKey(0)))
    assert np.isfinite(np.asarray(out["value_loss"])).all()
    leaf = jax.tree_util.tree_leaves(out["actor"])[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
