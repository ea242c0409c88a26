"""BatchRenorm tests: warmup equals BatchNorm, post-warmup corrections,
trainer integration."""

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.models.batch_renorm import BatchRenorm
from purejaxql_tpu.core.config import compose
from purejaxql_tpu.algo.pqn import make_train


def test_warmup_matches_batchnorm():
    """During warmup, BatchRenorm must normalize exactly like BatchNorm."""
    import flax.linen as nn

    x = jax.random.normal(jax.random.PRNGKey(0), (64, 8)) * 3 + 1
    brn = BatchRenorm(use_running_average=False, warmup_steps=1000,
                      epsilon=1e-5)
    bn = nn.BatchNorm(use_running_average=False, epsilon=1e-5,
                      momentum=0.999)
    v_brn = brn.init(jax.random.PRNGKey(1), x)
    v_bn = bn.init(jax.random.PRNGKey(1), x)
    y_brn, _ = brn.apply(v_brn, x, mutable=["batch_stats"])
    y_bn, _ = bn.apply(v_bn, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_brn), np.asarray(y_bn),
                               rtol=1e-4, atol=1e-4)


def test_running_stats_update_and_steps():
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 4)) + 5.0
    mod = BatchRenorm(use_running_average=False)
    variables = mod.init(jax.random.PRNGKey(1), x)
    bs = variables["batch_stats"]
    assert int(bs["steps"]) == 0
    _, updates = mod.apply(variables, x, mutable=["batch_stats"])
    bs = updates["batch_stats"]
    assert int(bs["steps"]) == 1
    assert float(bs["mean"].mean()) > 0  # moved toward the batch mean of ~5


def test_post_warmup_uses_corrections():
    """After warmup with stable running stats, outputs should stay finite
    and the r/d path should engage (different from plain batch stats when
    the batch is shifted)."""
    mod = BatchRenorm(use_running_average=False, warmup_steps=5,
                      momentum=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (128, 4))
    variables = mod.init(jax.random.PRNGKey(1), x)
    for i in range(10):
        y, updates = mod.apply(variables, x, mutable=["batch_stats"])
        variables = {**variables, "batch_stats": updates["batch_stats"]}
    # now feed a shifted batch: renorm (r/d toward running stats) should
    # NOT fully whiten it the way plain batchnorm would
    x_shift = x + 10.0
    y, _ = mod.apply(variables, x_shift, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(y)).all()
    assert abs(float(jnp.mean(y))) > 0.5  # d_max-clipped, not zero-mean


def test_trainer_with_batch_renorm():
    config = compose(
        alg="pqn_cartpole",
        overrides=[
            "TOTAL_TIMESTEPS=8192", "TOTAL_TIMESTEPS_DECAY=8192",
            "NUM_ENVS=16", "NUM_STEPS=32", "NUM_MINIBATCHES=4",
            "NUM_EPOCHS=1", "HIDDEN_SIZE=32", "TEST_DURING_TRAINING=False",
            "NORM_TYPE=batch_renorm",
        ],
    )
    rngs = jax.random.split(jax.random.PRNGKey(0), 1)
    outs = jax.block_until_ready(jax.jit(jax.vmap(make_train(config)))(rngs))
    assert np.isfinite(np.asarray(outs["metrics"]["td_loss"])).all()
    bs = outs["runner_state"][0].batch_stats
    # the steps counter advanced once per grad step
    steps_leaves = [
        v for k, v in jax.tree_util.tree_leaves_with_path(bs)
        if "steps" in str(k)
    ]
    assert steps_leaves and int(np.asarray(steps_leaves[0]).max()) > 0


def test_nature_cnn_forward():
    """NatureCNN trunk (the Atari-scale Q-net) compiles and shapes check
    on 84x84x4 byte observations."""
    import jax.numpy as jnp
    from purejaxql_tpu.models.cnn import CNNQNetwork

    net = CNNQNetwork(action_dim=6, norm_type="layer_norm", trunk="nature")
    x = jnp.zeros((8, 84, 84, 4))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    q = net.apply(variables, x, train=False)
    assert q.shape == (8, 6)
    # dummy input norm present: param tree identical to norm_input=True
    net2 = CNNQNetwork(action_dim=6, norm_type="layer_norm", trunk="nature",
                       norm_input=True)
    v2 = net2.init(jax.random.PRNGKey(0), x, train=False)
    t1 = jax.tree_util.tree_structure(variables)
    t2 = jax.tree_util.tree_structure(v2)
    assert t1 == t2
