"""Lambda-return tests: recurrence vs. brute-force reference, episode cuts."""

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.algo.returns import (
    lambda_returns,
    lambda_returns_closure,
    td_one_step_targets,
)


def brute_force_lambda(last_q, rewards, dones, max_qs, gamma, lam):
    """Direct translation of the reference reverse scan
    (pqn_gymnax.py:231-254), in python, for cross-checking."""
    T, E = rewards.shape
    last_q = last_q * (1 - dones[-1])
    lam_ret = rewards[-1] + gamma * last_q
    out = [lam_ret]
    next_q = last_q
    cur = lam_ret
    for t in range(T - 2, -1, -1):
        target_bootstrap = rewards[t] + gamma * (1 - dones[t]) * next_q
        delta = cur - next_q
        cur = target_bootstrap + gamma * lam * delta
        cur = (1 - dones[t]) * cur + dones[t] * rewards[t]
        next_q = max_qs[t]
        out.append(cur)
    return np.stack(out[::-1])


def test_lambda_returns_matches_bruteforce():
    rng = np.random.RandomState(0)
    T, E = 12, 5
    rewards = rng.randn(T, E).astype(np.float32)
    dones = (rng.rand(T, E) < 0.15).astype(np.float32)
    max_qs = rng.randn(T, E).astype(np.float32)
    last_q = rng.randn(E).astype(np.float32)

    got = lambda_returns(
        jnp.asarray(last_q),
        jnp.asarray(rewards),
        jnp.asarray(dones),
        jnp.asarray(max_qs),
        0.99,
        0.9,
    )
    want = brute_force_lambda(last_q, rewards, dones, max_qs, 0.99, 0.9)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_lambda_zero_is_one_step_td():
    """With lambda=0 and no dones, R_t = r_t + gamma * maxQ(s_{t+1}).

    In the recurrence's convention, bootstrap for step t uses the recorded
    q_val of step t+1 (shifted by the scan carry)."""
    rng = np.random.RandomState(1)
    T, E = 6, 3
    rewards = rng.randn(T, E).astype(np.float32)
    dones = np.zeros((T, E), np.float32)
    max_qs = rng.randn(T, E).astype(np.float32)
    last_q = rng.randn(E).astype(np.float32)

    got = np.asarray(
        lambda_returns(
            jnp.asarray(last_q),
            jnp.asarray(rewards),
            jnp.asarray(dones),
            jnp.asarray(max_qs),
            0.99,
            0.0,
        )
    )
    # last two rows bootstrap from last_q (the reference convention),
    # earlier rows from the recorded next-step q_vals
    np.testing.assert_allclose(got[-1], rewards[-1] + 0.99 * last_q, rtol=1e-5)
    np.testing.assert_allclose(got[-2], rewards[-2] + 0.99 * last_q, rtol=1e-5)
    for t in range(T - 2):
        np.testing.assert_allclose(
            got[t], rewards[t] + 0.99 * max_qs[t + 1], rtol=1e-5
        )


def test_done_cuts_bootstrap():
    """A done at step t makes R_t exactly r_t regardless of future values."""
    T, E = 5, 2
    rewards = np.ones((T, E), np.float32) * 2.0
    dones = np.zeros((T, E), np.float32)
    dones[2] = 1.0
    max_qs = np.full((T, E), 100.0, np.float32)
    last_q = np.full((E,), 100.0, np.float32)

    got = np.asarray(
        lambda_returns(
            jnp.asarray(last_q),
            jnp.asarray(rewards),
            jnp.asarray(dones),
            jnp.asarray(max_qs),
            0.99,
            0.9,
        )
    )
    np.testing.assert_allclose(got[2], rewards[2], rtol=1e-6)


def test_closure_form_agrees_when_carry_seeds_coincide():
    # The gymnax form seeds the scan carry's next_q with the masked bootstrap
    # last_q*(1-d[-1]); the closure form (pqn_atari.py:293-297) seeds it with
    # the recorded rollout max_qs[-1].  The forms coincide exactly when
    # d[-1] == 0 and max_qs[-1] == last_q.
    rng = np.random.RandomState(2)
    T, E = 8, 4
    rewards = rng.randn(T, E).astype(np.float32)
    dones = (rng.rand(T, E) < 0.2).astype(np.float32)
    dones[-1] = 0.0
    max_qs = rng.randn(T, E).astype(np.float32)
    last_q = rng.randn(E).astype(np.float32)
    max_qs[-1] = last_q

    a = np.asarray(
        lambda_returns(
            jnp.asarray(last_q), jnp.asarray(rewards), jnp.asarray(dones),
            jnp.asarray(max_qs), 0.95, 0.7,
        )
    )
    b = np.asarray(
        lambda_returns_closure(
            jnp.asarray(last_q), jnp.asarray(rewards), jnp.asarray(dones),
            jnp.asarray(max_qs), 0.95, 0.7,
        )
    )
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def brute_force_closure(last_q, rewards, dones, max_qs, gamma, lam):
    """Direct translation of the atari/rnn closure form (pqn_atari.py:280-302):
    the T-1 return bootstraps from last_q, but the carry's next_q is seeded
    with the recorded rollout max_qs[-1]."""
    T, E = rewards.shape
    lam_ret = rewards[-1] + gamma * (1 - dones[-1]) * last_q
    out = [lam_ret]
    next_q = max_qs[-1]
    cur = lam_ret
    for t in range(T - 2, -1, -1):
        target_bootstrap = rewards[t] + gamma * (1 - dones[t]) * next_q
        delta = cur - next_q
        cur = target_bootstrap + gamma * lam * delta
        cur = (1 - dones[t]) * cur + dones[t] * rewards[t]
        next_q = max_qs[t]
        out.append(cur)
    return np.stack(out[::-1])


def test_closure_form_matches_bruteforce():
    rng = np.random.RandomState(7)
    T, E = 10, 4
    rewards = rng.randn(T, E).astype(np.float32)
    dones = (rng.rand(T, E) < 0.25).astype(np.float32)
    max_qs = rng.randn(T, E).astype(np.float32)
    last_q = rng.randn(E).astype(np.float32)

    got = lambda_returns_closure(
        jnp.asarray(last_q), jnp.asarray(rewards), jnp.asarray(dones),
        jnp.asarray(max_qs), 0.99, 0.65,
    )
    want = brute_force_closure(last_q, rewards, dones, max_qs, 0.99, 0.65)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_one_step_targets():
    r = jnp.asarray([[1.0], [2.0]])
    d = jnp.asarray([[0.0], [1.0]])
    nq = jnp.asarray([[3.0], [4.0]])
    got = td_one_step_targets(r, d, nq, 0.5)
    np.testing.assert_allclose(np.asarray(got), [[2.5], [2.0]])
