"""Segmented fused training tests: continuation correctness."""

import jax
import numpy as np

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.algo.segmented import train_segmented


def seg_config():
    return compose(
        alg="pqn_cartpole",
        overrides=[
            "TOTAL_TIMESTEPS=16384", "TOTAL_TIMESTEPS_DECAY=16384",
            "NUM_ENVS=16", "NUM_STEPS=32", "NUM_MINIBATCHES=4",
            "NUM_EPOCHS=1", "HIDDEN_SIZE=32", "TEST_DURING_TRAINING=False",
        ],
    )


def test_segments_cover_full_run():
    outs = train_segmented(seg_config(), num_segments=4)
    ts = outs["runner_state"][0]
    assert int(np.asarray(ts.timesteps)[0]) == 16384
    assert int(np.asarray(ts.n_updates)[0]) == 32  # 16384/(16*32)
    # metrics concatenated across segments: 32 updates total
    assert outs["metrics"]["td_loss"].shape == (1, 32)


def test_counters_and_schedules_continue():
    """grad_steps must accumulate monotonically across segments (no
    schedule restart)."""
    seen = []

    def on_segment(seg, runner_state, metrics):
        seen.append(int(np.asarray(runner_state[0].grad_steps)[0]))

    train_segmented(seg_config(), num_segments=4, on_segment=on_segment)
    # 8 updates/segment x (1 epoch x 4 minibatches) = 32 grad steps/segment
    assert seen == [32, 64, 96, 128], seen


def test_segmented_learns_like_monolith():
    """Segment boundaries must not break learning dynamics: the final
    loss scale matches a monolithic run's ballpark and returns improve."""
    config = compose(
        alg="pqn_cartpole",
        overrides=[
            "TOTAL_TIMESTEPS=131072", "TOTAL_TIMESTEPS_DECAY=131072",
            "NUM_ENVS=16", "NUM_STEPS=32", "NUM_MINIBATCHES=4",
            "NUM_EPOCHS=2", "TEST_DURING_TRAINING=False",
        ],
    )
    outs = train_segmented(config, num_segments=4)
    rets = np.asarray(outs["metrics"]["returned_episode_returns"][0])
    assert rets[-20:].mean() > rets[:20].mean() * 2, (
        rets[:20].mean(), rets[-20:].mean()
    )


def test_segmented_bitwise_equals_monolith():
    """Segmentation is free: the 4-segment run's params, counters and env
    stream are bit-identical to one fused program (the update scan runs off
    the rng carried in runner_state)."""
    from purejaxql_tpu.algo.pqn import make_train

    config = seg_config()
    mono = jax.jit(jax.vmap(make_train(config)))(
        jax.random.split(jax.random.PRNGKey(0), 1)
    )
    seg = train_segmented(config, num_segments=4)
    for a, b in zip(
        jax.tree_util.tree_leaves(mono["runner_state"][0].params),
        jax.tree_util.tree_leaves(seg["runner_state"][0].params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(mono["runner_state"][0].timesteps),
        np.asarray(seg["runner_state"][0].timesteps),
    )
