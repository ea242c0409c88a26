"""Pallas TPU kernel for fused epsilon-greedy action selection.

The parity path (algo/exploration.py) splits one key into E per-env
threefry keys every rollout step and vmaps a two-way split per env — a
few hundred VPU ops of counter-mode hashing per step. This kernel instead
uses the TPU's hardware PRNG (pltpu.prng_random_bits): one seed, two
(E,)-draws, argmax fused in the same program.

This is an OPT-IN fast path (config EXPLORATION_KERNEL="pallas"): the
random stream differs from the reference's threefry discipline, so
bitwise trajectory parity is traded for rollout speed. Statistically it
is the same policy: P(random action) = eps, uniform over actions (modulo
bias < 2^-24 for action counts that don't divide 2^32).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _eps_greedy_kernel(seed_ref, eps_ref, q_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])
    E, A = q_ref.shape
    greedy = jnp.argmax(q_ref[:, :], axis=-1).astype(jnp.int32)

    explore_bits = pltpu.bitcast(pltpu.prng_random_bits((E, 1)), jnp.uint32)
    action_bits = pltpu.bitcast(pltpu.prng_random_bits((E, 1)), jnp.uint32)
    # uniform in [0, 1) from the top 24 bits (via int32: Mosaic has no
    # direct uint32->float32 cast)
    u = (explore_bits >> 8).astype(jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 24)
    )
    random_actions = (action_bits >> 8).astype(jnp.int32) % A

    take_random = u < eps_ref[0]
    out_ref[:, :] = jnp.where(take_random, random_actions, greedy[:, None])


@partial(jax.jit, static_argnames=("interpret",))
def eps_greedy_pallas(
    seed: jax.Array,
    q_vals: jax.Array,
    eps: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Fused eps-greedy: q_vals (E, A), scalar eps, int32 seed -> (E,)."""
    E, A = q_vals.shape
    pad = (-E) % 8
    if pad:
        q_vals = jnp.concatenate(
            [q_vals, jnp.zeros((pad, A), q_vals.dtype)], axis=0
        )
    out = pl.pallas_call(
        _eps_greedy_kernel,
        out_shape=jax.ShapeDtypeStruct((q_vals.shape[0], 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([eps], jnp.float32),
        q_vals,
    )
    return out[:E, 0]
