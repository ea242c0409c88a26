"""RESET_BANK (amortized worldgen) and FAST_TARGETS (out-of-grad TD
bootstrap) — the opt-in craftax-class fast paths."""

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.envs import make, wrappers
from purejaxql_tpu.algo.pqn import make_train
import pytest


def test_banked_reset_semantics():
    """Done envs receive fresh (time=0) worlds gathered from the bank;
    live envs are untouched; the refresh burst fires every refresh_every
    steps rotating num_resets rows."""
    env, params = make("CartPole-v1")
    log_env = wrappers.Log(env)
    wenv = wrappers.BankedResetVecEnv(
        log_env, num_envs=8, reset_ratio=4, bank_size=16, refresh_every=5
    )
    key = jax.random.PRNGKey(0)
    obs, state = wenv.reset(key, params)
    assert state.bank_w32.shape[0] == 16  # packed bank rows = bank_size
    assert int(state.cursor) == 0

    # drive until some envs are done; cursor advances by num_resets (2)
    # on ticks 0, 5, 10, ... (burst at tick % 5 == 0)
    done_seen = False
    for t in range(60):
        acts = jnp.zeros(8, jnp.int32)
        obs, state, r, done, info = wenv.step(
            jax.random.fold_in(key, t), state, acts, params
        )
        bursts = t // 5 + 1  # tick==t when stepping (0-based, pre-inc)
        assert int(state.cursor) == (2 * bursts) % 16, (t, int(state.cursor))
        if bool(done.any()):
            done_seen = True
            # done envs get fresh (time=0) worlds, up to num_resets per
            # step — extras defer to the next step (_scatter_resets;
            # synchronized CartPole deaths exceed 2 candidates here)
            times = np.asarray(state.env_state.env_state.time)
            n_fresh = int((times[np.asarray(done)] == 0).sum())
            assert n_fresh >= min(int(np.asarray(done).sum()), 2)
    assert done_seen


def test_reset_bank_trains_and_matches_quality():
    """The banked trainer runs end-to-end and reaches episode returns in
    the same band as the optimistic-reset trainer on the same tiny
    CartPole budget (mechanism equivalence, not bitwise parity)."""
    base = [
        "TOTAL_TIMESTEPS=32768", "TOTAL_TIMESTEPS_DECAY=32768",
        "NUM_ENVS=32", "NUM_STEPS=8", "NUM_MINIBATCHES=2", "NUM_EPOCHS=2",
        "HIDDEN_SIZE=64", "TEST_DURING_TRAINING=False",
        "USE_OPTIMISTIC_RESETS=True", "OPTIMISTIC_RESET_RATIO=8",
        "COLLECT_METRICS=True",
    ]
    cfg_opt = compose(alg="pqn_cartpole", overrides=base)
    cfg_bank = compose(
        alg="pqn_cartpole",
        overrides=base + ["RESET_BANK=64", "RESET_BANK_REFRESH_EVERY=4"],
    )
    out_o = jax.block_until_ready(
        jax.jit(make_train(cfg_opt))(jax.random.PRNGKey(0))
    )
    out_b = jax.block_until_ready(
        jax.jit(make_train(cfg_bank))(jax.random.PRNGKey(0))
    )
    r_o = np.asarray(out_o["metrics"]["returned_episode_returns"])[-16:].mean()
    r_b = np.asarray(out_b["metrics"]["returned_episode_returns"])[-16:].mean()
    assert np.isfinite(r_b)
    # same learning band (CartPole at this budget reaches ~25-60)
    assert r_b > 0.5 * r_o, (r_o, r_b)


def test_reset_bank_on_forager_smoke():
    """The banked wrapper composes with the craftax-class env (big state
    pytrees with per-floor maps) under jit."""
    cfg = compose(
        alg="pqn_craftax",
        overrides=[
            "TOTAL_TIMESTEPS=256", "TOTAL_TIMESTEPS_DECAY=256",
            "NUM_ENVS=32", "OPTIMISTIC_RESET_RATIO=8",
            "RESET_BANK=16", "RESET_BANK_REFRESH_EVERY=4",
            "HIDDEN_SIZE=64", "NUM_LAYERS=2",
            "TEST_DURING_TRAINING=False", "COLLECT_METRICS=False",
        ],
    )
    out = jax.block_until_ready(
        jax.jit(make_train(cfg))(jax.random.PRNGKey(0))
    )
    assert int(out["runner_state"][0].timesteps) == 256


def test_fast_targets_identical_gradients():
    """FAST_TARGETS computes the stop-gradient bootstrap outside the grad
    closure — the resulting training trajectory matches the reference
    concat formulation to float tolerance (layer_norm => no batch-stats
    coupling)."""
    base = [
        "TOTAL_TIMESTEPS=4096", "TOTAL_TIMESTEPS_DECAY=4096",
        "NUM_ENVS=16", "NUM_STEPS=8", "NUM_MINIBATCHES=2", "NUM_EPOCHS=1",
        "HIDDEN_SIZE=64", "TEST_DURING_TRAINING=False",
        "Q_LAMBDA=False", "LAMBDA=0", "COLLECT_METRICS=False",
    ]
    cfg_ref = compose(alg="pqn_cartpole", overrides=base)
    cfg_fast = compose(
        alg="pqn_cartpole", overrides=base + ["FAST_TARGETS=True"]
    )
    out_r = jax.block_until_ready(
        jax.jit(make_train(cfg_ref))(jax.random.PRNGKey(3))
    )
    out_f = jax.block_until_ready(
        jax.jit(make_train(cfg_fast))(jax.random.PRNGKey(3))
    )
    pr = jax.tree_util.tree_leaves(out_r["runner_state"][0].params)
    pf = jax.tree_util.tree_leaves(out_f["runner_state"][0].params)
    for a, b in zip(pr, pf):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_fast_targets_rejects_batch_stats_norms():
    cfg = compose(
        alg="pqn_cartpole",
        overrides=[
            "FAST_TARGETS=True", "NORM_TYPE=batch_norm", "Q_LAMBDA=False",
        ],
    )
    with pytest.raises(ValueError, match="FAST_TARGETS"):
        make_train(cfg)


def test_pack_unpack_rows_roundtrip():
    """The packed-bank flatten is exact for every leaf dtype the env
    states use (bool, int8, int32, float32 — incl. NaN payloads)."""
    key = jax.random.PRNGKey(3)
    tree = {
        "blocks": jax.random.randint(key, (6, 3, 4), -128, 128).astype(
            jnp.int8
        ),
        "alive": jax.random.bernoulli(key, 0.5, (6, 5)),
        "inv": jax.random.randint(key, (6, 7), -(2**30), 2**30),
        "ret": jnp.float32(
            np.r_[np.nan, np.inf, -0.0, 1e-38, 3.14, -7].reshape(6, 1)
        )
        * jnp.ones((6, 4)),
        "t": jnp.arange(6, dtype=jnp.int32),  # scalar-per-row leaf
    }
    w8, w32 = wrappers._pack_rows(tree)
    assert w8.dtype == jnp.int8 and w32.dtype == jnp.int32
    out = wrappers._unpack_rows(w8, w32, tree)
    for k in tree:
        assert out[k].dtype == tree[k].dtype, k
        np.testing.assert_array_equal(
            np.asarray(out[k]).view(np.uint8),
            np.asarray(tree[k]).view(np.uint8),
            err_msg=k,
        )


def test_skip_noop_permute_matches_to_float_tolerance():
    """With NUM_MINIBATCHES=1 the shared-key permutation only reorders
    rows of the single batch; the fast path drops the gather and must
    match the permuted run up to float summation order."""
    base = [
        "TOTAL_TIMESTEPS=4096", "TOTAL_TIMESTEPS_DECAY=4096",
        "NUM_ENVS=32", "NUM_STEPS=4", "NUM_MINIBATCHES=1", "NUM_EPOCHS=2",
        "HIDDEN_SIZE=64", "TEST_DURING_TRAINING=False",
        "Q_LAMBDA=False", "LAMBDA=0", "COLLECT_METRICS=False",
        "FAST_TARGETS=True",
    ]
    cfg_skip = compose(alg="pqn_cartpole", overrides=base)
    cfg_keep = compose(
        alg="pqn_cartpole", overrides=base + ["SKIP_NOOP_PERMUTE=False"]
    )
    out_s = jax.block_until_ready(
        jax.jit(make_train(cfg_skip))(jax.random.PRNGKey(5))
    )
    out_k = jax.block_until_ready(
        jax.jit(make_train(cfg_keep))(jax.random.PRNGKey(5))
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(out_s["runner_state"][0].params),
        jax.tree_util.tree_leaves(out_k["runner_state"][0].params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_fast_targets_with_input_norm_close():
    """With NORM_INPUT=True the fast bootstrap must normalize next_obs
    with FRESH batch statistics (train=True, mutation discarded) like the
    concat formulation — not warmup-biased running averages. Per-half vs
    union batch moments differ slightly, so the check is a close match,
    not bitwise."""
    base = [
        "TOTAL_TIMESTEPS=4096", "TOTAL_TIMESTEPS_DECAY=4096",
        "NUM_ENVS=16", "NUM_STEPS=8", "NUM_MINIBATCHES=2", "NUM_EPOCHS=1",
        "HIDDEN_SIZE=64", "TEST_DURING_TRAINING=False",
        "Q_LAMBDA=False", "LAMBDA=0", "COLLECT_METRICS=False",
        "NORM_INPUT=True",
    ]
    out_r = jax.block_until_ready(
        jax.jit(make_train(compose(alg="pqn_cartpole", overrides=base)))(
            jax.random.PRNGKey(3)
        )
    )
    out_f = jax.block_until_ready(
        jax.jit(
            make_train(
                compose(
                    alg="pqn_cartpole", overrides=base + ["FAST_TARGETS=True"]
                )
            )
        )(jax.random.PRNGKey(3))
    )
    pr = jax.tree_util.tree_leaves(out_r["runner_state"][0].params)
    pf = jax.tree_util.tree_leaves(out_f["runner_state"][0].params)
    for a, b in zip(pr, pf):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        # same scale, small drift from per-half vs union input moments
        np.testing.assert_allclose(a, b, rtol=0.15, atol=0.02)
