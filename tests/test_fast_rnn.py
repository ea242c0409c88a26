"""FAST_BPTT / PALLAS_BPTT: the hoisted-projection BPTT forward and the
Pallas GRU time-scan kernels must reproduce the flax path — values, grads,
and the end-to-end trainer (ops/fast_rnn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.models.rnn import RNNQNetwork
from purejaxql_tpu.ops.fast_rnn import fast_rnn_train_forward


T, B, F, H, A = 13, 4, 6, 32, 3
KW = dict(
    num_layers=2, num_rnn_layers=2, action_dim=A,
    add_last_action=True, norm_input=True,
)


@pytest.fixture(scope="module")
def setup():
    net = RNNQNetwork(
        action_dim=A, hidden_size=H, num_layers=2, num_rnn_layers=2,
        cell_type="gru", norm_input=True, norm_type="layer_norm",
        add_last_action=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (T, B, F))
    done = (
        jax.random.uniform(jax.random.PRNGKey(1), (T, B)) < 0.2
    ).astype(jnp.float32)
    la = jax.random.randint(jax.random.PRNGKey(2), (T, B), 0, A)
    hs = [h + 0.3 for h in net.initialize_carry(B)]
    variables = net.init(jax.random.PRNGKey(3), hs, x, done, la, train=False)
    return net, variables, hs, x, done, la


@pytest.mark.parametrize("pallas", [False, True])
def test_forward_matches_flax(setup, pallas):
    net, variables, hs, x, done, la = setup
    (newh, q), upd = net.apply(
        variables, hs, x, done, la, train=True, mutable=["batch_stats"]
    )
    newh2, q2, bs2 = fast_rnn_train_forward(
        variables["params"], variables["batch_stats"], hs, x, done, la,
        pallas=pallas, interpret=True, **KW,
    )
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(upd["batch_stats"]),
        jax.tree_util.tree_leaves(bs2),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(newh), jax.tree_util.tree_leaves(newh2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("pallas", [False, True])
def test_grads_match_flax(setup, pallas):
    net, variables, hs, x, done, la = setup

    def loss_flax(p):
        (_, q), _ = net.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            hs, x, done, la, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(jnp.sin(q))

    def loss_fast(p):
        _, q, _ = fast_rnn_train_forward(
            p, variables["batch_stats"], hs, x, done, la,
            pallas=pallas, interpret=True, **KW,
        )
        return jnp.sum(jnp.sin(q))

    g1 = jax.grad(loss_flax)(variables["params"])
    g2 = jax.grad(loss_fast)(variables["params"])
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4
        )


def test_lstm_batchrenorm_forward_and_grads_match_flax():
    """The pqn_rnn_craftax family shape: LSTM cells + BatchRenorm input
    norm + layer_norm trunk + ADD_LAST_ACTION."""
    net = RNNQNetwork(
        action_dim=A, hidden_size=H, num_layers=1, num_rnn_layers=2,
        cell_type="lstm", norm_input=True, norm_type="layer_norm",
        input_norm_type="batch_renorm", add_last_action=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (T, B, F))
    done = (
        jax.random.uniform(jax.random.PRNGKey(1), (T, B)) < 0.2
    ).astype(jnp.float32)
    la = jax.random.randint(jax.random.PRNGKey(2), (T, B), 0, A)
    hs = [
        jax.tree_util.tree_map(lambda h: h + 0.3, c)
        for c in net.initialize_carry(B)
    ]
    variables = net.init(jax.random.PRNGKey(3), hs, x, done, la, train=False)
    kw = dict(
        num_layers=1, num_rnn_layers=2, action_dim=A,
        add_last_action=True, norm_input=True,
        cell_type="lstm", input_norm_type="batch_renorm",
    )

    (newh, q), upd = net.apply(
        variables, hs, x, done, la, train=True, mutable=["batch_stats"]
    )
    newh2, q2, bs2 = fast_rnn_train_forward(
        variables["params"], variables["batch_stats"], hs, x, done, la, **kw
    )
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(upd["batch_stats"]),
        jax.tree_util.tree_leaves(bs2),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(newh), jax.tree_util.tree_leaves(newh2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def loss_flax(p):
        (_, q), _ = net.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            hs, x, done, la, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(jnp.sin(q))

    def loss_fast(p):
        _, q, _ = fast_rnn_train_forward(
            p, variables["batch_stats"], hs, x, done, la, **kw
        )
        return jnp.sum(jnp.sin(q))

    g1 = jax.grad(loss_flax)(variables["params"])
    g2 = jax.grad(loss_fast)(variables["params"])
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4
        )


def test_trainer_fast_bptt_matches_flax_closely():
    """End-to-end: the FAST_BPTT trainer tracks the flax trainer's learning
    trajectory (same config/seed) to float tolerance over a short run."""
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn_rnn import make_train

    overrides = [
        "TOTAL_TIMESTEPS=4096",
        "TOTAL_TIMESTEPS_DECAY=4096",
        "NUM_ENVS=8",
        "NUM_STEPS=16",
        "MEMORY_WINDOW=4",
        "NUM_MINIBATCHES=2",
        "NUM_EPOCHS=1",
        "HIDDEN_SIZE=32",
        "TEST_DURING_TRAINING=False",
    ]
    cfg = compose(alg="pqn_rnn_cartpole", overrides=overrides)
    cfg_fast = compose(
        alg="pqn_rnn_cartpole", overrides=overrides + ["FAST_BPTT=True"]
    )
    rng = jax.random.PRNGKey(0)
    out = jax.jit(make_train(dict(cfg)))(rng)
    out_fast = jax.jit(make_train(dict(cfg_fast)))(rng)
    a = jax.tree_util.tree_leaves(out["runner_state"][0].params)
    b = jax.tree_util.tree_leaves(out_fast["runner_state"][0].params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=5e-4, rtol=1e-3
        )


def test_fast_bptt_rejects_unsupported_family():
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn_rnn import make_train

    # batch_norm trunk is outside the fast path
    cfg = compose(
        alg="pqn_rnn_cartpole",
        overrides=[
            "FAST_BPTT=True", "NORM_TYPE=batch_norm", "TOTAL_TIMESTEPS=1024",
        ],
    )
    with pytest.raises(ValueError, match="FAST_BPTT"):
        make_train(dict(cfg))
    # the Pallas kernel is GRU-only
    cfg = compose(
        alg="pqn_rnn_craftax",
        overrides=[
            "FAST_BPTT=True", "PALLAS_BPTT=True", "TOTAL_TIMESTEPS=1024",
        ],
    )
    with pytest.raises(ValueError, match="FAST_BPTT"):
        make_train(dict(cfg))


def test_trainer_fast_bptt_vdn_matches_flax_closely():
    """The VDN trainer's FAST_BPTT path tracks the flax trainer."""
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn_vdn import make_train

    overrides = [
        "TOTAL_TIMESTEPS=2048",
        "TOTAL_TIMESTEPS_DECAY=2048",
        "NUM_ENVS=8",
        "NUM_STEPS=8",
        "MEMORY_WINDOW=4",
        "NUM_MINIBATCHES=2",
        "NUM_EPOCHS=1",
        "HIDDEN_SIZE=32",
        "NUM_LAYERS=1",
        "TEST_DURING_TRAINING=False",
    ]
    cfg = compose(alg="pqn_vdn_spread", overrides=overrides)
    cfg_fast = compose(
        alg="pqn_vdn_spread", overrides=overrides + ["FAST_BPTT=True"]
    )
    rng = jax.random.split(jax.random.PRNGKey(0), 1)
    out = jax.jit(jax.vmap(make_train(dict(cfg))))(rng)
    out_fast = jax.jit(jax.vmap(make_train(dict(cfg_fast))))(rng)
    a = jax.tree_util.tree_leaves(out["runner_state"][0].params)
    b = jax.tree_util.tree_leaves(out_fast["runner_state"][0].params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=5e-4, rtol=1e-3
        )


def test_trainer_fast_bptt_lstm_craftax_trains():
    """The LSTM fast path runs end-to-end on the craftax-family config and
    stays finite (value-equivalence is pinned by the unit tests above)."""
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn_rnn import make_train

    overrides = [
        "TOTAL_TIMESTEPS=1024",
        "TOTAL_TIMESTEPS_DECAY=1024",
        "NUM_ENVS=8",
        "NUM_STEPS=8",
        "MEMORY_WINDOW=4",
        "NUM_MINIBATCHES=2",
        "NUM_EPOCHS=1",
        "HIDDEN_SIZE=32",
        "NUM_LAYERS=1",
        "NUM_RNN_LAYERS=1",
        "OPTIMISTIC_RESET_RATIO=4",
        "TEST_DURING_TRAINING=False",
    ]
    cfg = compose(alg="pqn_rnn_craftax", overrides=overrides)
    cfg_fast = compose(
        alg="pqn_rnn_craftax", overrides=overrides + ["FAST_BPTT=True"]
    )
    rng = jax.random.split(jax.random.PRNGKey(0), 1)
    out = jax.jit(jax.vmap(make_train(dict(cfg))))(rng)
    out_fast = jax.jit(jax.vmap(make_train(dict(cfg_fast))))(rng)
    a = jax.tree_util.tree_leaves(out["runner_state"][0].params)
    b = jax.tree_util.tree_leaves(out_fast["runner_state"][0].params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=5e-4, rtol=1e-3
        )


def test_mp_matmul_bf16_close_and_f32_exact():
    """Mixed-precision GEMM: bf16 operands/f32 accumulation tracks the
    f32 product to bf16 tolerance; dtype=f32 is the literal `@`."""
    from purejaxql_tpu.ops.fast_rnn import _mp_matmul

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(k1, (6, 32, 48))
    b = jax.random.normal(k2, (48, 96))
    exact = a @ b
    np.testing.assert_array_equal(
        np.asarray(_mp_matmul(a, b, jnp.float32)), np.asarray(exact)
    )
    approx = np.asarray(_mp_matmul(a, b, jnp.bfloat16))
    assert approx.dtype == np.float32  # f32 accumulation/result
    np.testing.assert_allclose(
        approx, np.asarray(exact), atol=0.15, rtol=0.03
    )


def test_trainer_fast_bptt_bf16_lstm_trains_close_to_f32():
    """BF16_COMPUTE + FAST_BPTT (the rnn_craftax mixed-precision learn
    phase): trains finite and the learned params stay in the f32 path's
    neighborhood over a short run — master weights are f32, only the
    GEMM operands quantize."""
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn_rnn import make_train

    overrides = [
        "TOTAL_TIMESTEPS=2048",
        "TOTAL_TIMESTEPS_DECAY=2048",
        "NUM_ENVS=8",
        "NUM_STEPS=8",
        "MEMORY_WINDOW=4",
        "NUM_MINIBATCHES=2",
        "NUM_EPOCHS=1",
        "HIDDEN_SIZE=32",
        "NUM_LAYERS=1",
        "NUM_RNN_LAYERS=1",
        "OPTIMISTIC_RESET_RATIO=4",
        "TEST_DURING_TRAINING=False",
        "FAST_BPTT=True",
    ]
    rng = jax.random.split(jax.random.PRNGKey(0), 1)
    cfg32 = compose(alg="pqn_rnn_craftax", overrides=overrides)
    cfg16 = compose(
        alg="pqn_rnn_craftax", overrides=overrides + ["BF16_COMPUTE=True"]
    )
    out32 = jax.jit(jax.vmap(make_train(dict(cfg32))))(rng)
    out16 = jax.jit(jax.vmap(make_train(dict(cfg16))))(rng)
    losses = np.asarray(out16["metrics"]["td_loss"])
    assert np.isfinite(losses).all()
    a = jax.tree_util.tree_leaves(out32["runner_state"][0].params)
    b = jax.tree_util.tree_leaves(out16["runner_state"][0].params)
    # same trajectory modulo quantization noise accumulated over updates
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=0.05, rtol=0.1
        )
