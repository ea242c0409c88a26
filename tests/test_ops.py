"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
TPU by bench/TPU runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.algo.returns import lambda_returns
from purejaxql_tpu.ops.pallas_returns import lambda_returns_pallas
from purejaxql_tpu.ops.pallas_explore import eps_greedy_pallas

# The hardware-PRNG kernel (pltpu.prng_seed) has no CPU interpret rule;
# its tests run only on a real TPU (see also bench/TPU validation runs).
requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="pltpu PRNG primitives need TPU",
)


def test_pallas_lambda_matches_xla():
    rng = np.random.RandomState(0)
    T, E = 16, 200  # E deliberately not a multiple of 128 (padding path)
    rewards = rng.randn(T, E).astype(np.float32)
    dones = (rng.rand(T, E) < 0.15).astype(np.float32)
    max_qs = rng.randn(T, E).astype(np.float32)
    last_q = rng.randn(E).astype(np.float32)

    want = lambda_returns(
        jnp.asarray(last_q), jnp.asarray(rewards), jnp.asarray(dones),
        jnp.asarray(max_qs), 0.99, 0.9,
    )
    got = lambda_returns_pallas(
        jnp.asarray(last_q), jnp.asarray(rewards), jnp.asarray(dones),
        jnp.asarray(max_qs), 0.99, 0.9, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pallas_lambda_aligned_width():
    rng = np.random.RandomState(1)
    T, E = 8, 256
    rewards = rng.randn(T, E).astype(np.float32)
    dones = np.zeros((T, E), np.float32)
    max_qs = rng.randn(T, E).astype(np.float32)
    last_q = rng.randn(E).astype(np.float32)
    want = lambda_returns(
        jnp.asarray(last_q), jnp.asarray(rewards), jnp.asarray(dones),
        jnp.asarray(max_qs), 0.95, 0.5,
    )
    got = lambda_returns_pallas(
        jnp.asarray(last_q), jnp.asarray(rewards), jnp.asarray(dones),
        jnp.asarray(max_qs), 0.95, 0.5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@requires_tpu
def test_pallas_eps_greedy_statistics():
    # compiled path: the hardware PRNG has no interpreter rule anywhere
    rng = np.random.RandomState(2)
    E, A = 512, 6
    q_vals = rng.randn(E, A).astype(np.float32)
    greedy = q_vals.argmax(-1)

    # eps=0 -> all greedy
    actions = np.asarray(
        eps_greedy_pallas(jnp.asarray(3), jnp.asarray(q_vals), jnp.asarray(0.0))
    )
    np.testing.assert_array_equal(actions, greedy)

    # eps=1 -> all random-ish: roughly uniform action histogram
    actions = np.asarray(
        eps_greedy_pallas(jnp.asarray(3), jnp.asarray(q_vals), jnp.asarray(1.0))
    )
    counts = np.bincount(actions, minlength=A)
    assert counts.min() > E / A * 0.5, counts

    # eps=0.5 -> a mix: about half the actions deviate from greedy at most
    actions = np.asarray(
        eps_greedy_pallas(jnp.asarray(4), jnp.asarray(q_vals), jnp.asarray(0.5))
    )
    frac_greedy = (actions == greedy).mean()
    assert 0.4 < frac_greedy < 0.8, frac_greedy


@requires_tpu
def test_pallas_eps_greedy_seed_dependence():
    q_vals = jnp.zeros((64, 4))
    a1 = np.asarray(eps_greedy_pallas(jnp.asarray(1), q_vals, jnp.asarray(1.0)))
    a2 = np.asarray(eps_greedy_pallas(jnp.asarray(2), q_vals, jnp.asarray(1.0)))
    assert not np.array_equal(a1, a2)
