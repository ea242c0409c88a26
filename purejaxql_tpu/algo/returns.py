"""Q(lambda) lambda-return computation — the signature PQN recurrence.

R_t = r_t + gamma * (1 - d_t) * [ (1 - lambda) * max_a Q(s_{t+1}, a)
                                   + lambda * R_{t+1} ]

computed right-to-left by a reverse `lax.scan`, with episode cuts on done.
Two bootstrap conventions exist in the reference (SURVEY.md §2.5 #4):

- "gymnax" form (pqn_gymnax.py:231-254): last_q is masked by done[-1]
  *before* forming the T-1 return, and the recurrence reads the recorded
  rollout q_vals of the *current* transition for the next carry.
- "closure" form (pqn_atari.py:280-302, rnn scripts): the T-1 return is
  r[-1] + gamma*(1-d[-1])*last_q — algebraically the same target.

Both are implemented; the gymnax form is the default because the parity
harness exercises it. The scan carries only two (E,)-vectors, so the whole
computation is VPU-bound and negligible next to the network passes; a fused
Pallas variant lives in ops/ for the very long horizon case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lambda_returns(
    last_q: jax.Array,
    rewards: jax.Array,
    dones: jax.Array,
    max_qs: jax.Array,
    gamma: float,
    lam: float,
) -> jax.Array:
    """Lambda returns, gymnax form.

    Args:
      last_q: (E,) max_a Q(s_T, a) — bootstrap from the post-rollout obs.
      rewards, dones: (T, E) rollout rewards and done flags.
      max_qs: (T, E) max_a Q(s_t, a) recorded during the rollout.
      gamma, lam: discount and lambda.

    Returns:
      (T, E) lambda-return targets.
    """
    last_q = last_q * (1.0 - dones[-1])
    bootstrap_return = rewards[-1] + gamma * last_q

    def _get_target(carry, x):
        lam_returns, next_q = carry
        reward, done, max_q = x
        target_bootstrap = reward + gamma * (1 - done) * next_q
        delta = lam_returns - next_q
        lam_returns = target_bootstrap + gamma * lam * delta
        lam_returns = (1 - done) * lam_returns + done * reward
        return (lam_returns, max_q), lam_returns

    _, targets = jax.lax.scan(
        _get_target,
        (bootstrap_return, last_q),
        (rewards[:-1], dones[:-1], max_qs[:-1]),
        reverse=True,
    )
    return jnp.concatenate([targets, bootstrap_return[None]])


def lambda_returns_closure(
    last_q: jax.Array,
    rewards: jax.Array,
    dones: jax.Array,
    max_qs: jax.Array,
    gamma: float,
    lam: float,
) -> jax.Array:
    """Lambda returns, closure form (atari/rnn scripts).

    The T-1 return is r[-1] + gamma*(1-d[-1])*last_q, and the scan carry's
    next_q is seeded with max_qs[-1] — the *recorded rollout Q* at the final
    step, not the masked bootstrap (pqn_atari.py:293-297: ``lambda_returns =
    reward[-1] + ...; last_q = jnp.max(q_vals[-1], ...)`` before the scan).
    """
    lam_returns = rewards[-1] + gamma * (1 - dones[-1]) * last_q

    def _get_target(carry, x):
        lam_ret, next_q = carry
        reward, done, max_q = x
        target_bootstrap = reward + gamma * (1 - done) * next_q
        delta = lam_ret - next_q
        lam_ret = target_bootstrap + gamma * lam * delta
        lam_ret = (1 - done) * lam_ret + done * reward
        return (lam_ret, max_q), lam_ret

    _, targets = jax.lax.scan(
        _get_target,
        (lam_returns, max_qs[-1]),
        (rewards[:-1], dones[:-1], max_qs[:-1]),
        reverse=True,
    )
    return jnp.concatenate([targets, lam_returns[None]])


def td_one_step_targets(
    rewards: jax.Array,
    dones: jax.Array,
    next_max_qs: jax.Array,
    gamma: float,
) -> jax.Array:
    """Plain 1-step TD targets r_t + gamma*(1-d_t)*max_a Q(s_{t+1},a) —
    the Q_LAMBDA=False path (pqn_craftax.py:277-304)."""
    return rewards + gamma * (1.0 - dones) * next_max_qs
