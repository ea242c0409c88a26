"""Exploration kernels: epsilon-greedy (per-env key/eps), masked variant for
multi-agent action spaces, Gaussian noise ladder for continuous control.

Reference semantics: pqn_gymnax.py:107-120 (eps-greedy),
pqn_vdn_rnn_jaxmarl.py:143-168 (masked), pqn_mujoco_playground.py:254-268
(per-env linspace noise). The key-split discipline (one split into
[random-action key, coin-flip key] per env) is preserved exactly — it is part
of the bitwise-parity surface (SURVEY.md §2.5 #2, #13).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eps_greedy(rng: jax.Array, q_vals: jax.Array, eps: jax.Array) -> jax.Array:
    """Single-env epsilon-greedy: rng is one key, q_vals (A,), eps scalar."""
    rng_a, rng_e = jax.random.split(rng)
    greedy_actions = jnp.argmax(q_vals, axis=-1)
    return jnp.where(
        jax.random.uniform(rng_e, greedy_actions.shape) < eps,
        jax.random.randint(
            rng_a, shape=greedy_actions.shape, minval=0, maxval=q_vals.shape[-1]
        ),
        greedy_actions,
    )


def eps_greedy_batch(rng: jax.Array, q_vals: jax.Array, eps: jax.Array) -> jax.Array:
    """Batched epsilon-greedy: rng one key -> per-env keys, q_vals (E, A),
    eps (E,). Matches the reference call shape
    (pqn_gymnax.py:188-190: split(rng, NUM_ENVS) then vmap)."""
    rngs = jax.random.split(rng, q_vals.shape[0])
    return jax.vmap(eps_greedy)(rngs, q_vals, eps)


def masked_eps_greedy(
    rng: jax.Array, q_vals: jax.Array, eps: jax.Array, avail_actions: jax.Array
) -> jax.Array:
    """Epsilon-greedy over a legal-action mask: illegal Q-values pushed to
    -1e10 for the greedy branch and random picks drawn only from legal
    actions (pqn_vdn_rnn_jaxmarl.py:137-168)."""
    rng_a, rng_e = jax.random.split(rng)
    masked_q = jnp.where(avail_actions.astype(bool), q_vals, -1e10)
    greedy_actions = jnp.argmax(masked_q, axis=-1)

    def sample_legal(key, avail):
        probs = avail.astype(jnp.float32)
        return jax.random.choice(
            key, jnp.arange(avail.shape[-1]), p=probs / probs.sum()
        )

    random_actions = sample_legal(rng_a, avail_actions)
    return jnp.where(
        jax.random.uniform(rng_e, greedy_actions.shape) < eps,
        random_actions,
        greedy_actions,
    )


def gaussian_noise_ladder(
    rng: jax.Array,
    actions: jax.Array,
    noise_std: jax.Array,
    low,
    high,
    scale=1.0,
    linspace: bool = True,
) -> jax.Array:
    """Additive exploration noise for deterministic continuous policies.

    With `linspace`, env i in the batch explores at std i/(E-1)*noise_std —
    a ladder from near-greedy to full noise, so some envs always exploit
    while others always explore (pqn_mujoco_playground.py:257-260).
    `scale` is the action half-range so noise_std is expressed in
    normalized action units.
    """
    n_envs = actions.shape[0]
    if linspace:
        stds = jnp.linspace(0.0, noise_std, n_envs)[:, None]
    else:
        stds = jnp.full((n_envs, 1), noise_std)
    noise = jax.random.normal(rng, actions.shape) * stds * scale
    return jnp.clip(actions + noise, low, high)
