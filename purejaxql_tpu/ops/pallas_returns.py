"""Pallas TPU kernel for the Q(lambda) reverse recurrence.

The pure-XLA implementation (algo/returns.py) lowers the reverse
`lax.scan` to a sequential loop whose body is a handful of (E,)-wide VPU
ops with loop-carried state written back to HBM each iteration. This
kernel runs the whole T-step recurrence inside one Pallas program with
every operand resident in VMEM: one kernel launch, no per-step HBM
traffic, rows padded to the 128-lane vector width.

Semantically identical to `algo.returns.lambda_returns` (gymnax form,
reference pqn_gymnax.py:231-254) — verified element-for-element in
tests/test_ops.py — so it can be switched in without affecting parity.
Enable per-run with config PALLAS_RETURNS=True.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lambda_kernel(rew_ref, done_ref, maxq_ref, lastq_ref, out_ref, *, gamma, lam):
    # All row values are kept 2-D (1, E): Mosaic's layout inference requires
    # rank >= 2 vectors (rank-1 ops crash when this kernel is batched under
    # the seed-vmap).
    T = rew_ref.shape[0]
    last_q = lastq_ref[0:1, :] * (1.0 - done_ref[T - 1:T, :])
    boot = rew_ref[T - 1:T, :] + gamma * last_q
    out_ref[T - 1:T, :] = boot

    def body(i, carry):
        lam_ret, next_q = carry
        t = T - 2 - i
        r = rew_ref[pl.ds(t, 1), :]
        d = done_ref[pl.ds(t, 1), :]
        target_bootstrap = r + gamma * (1.0 - d) * next_q
        lam_ret = target_bootstrap + gamma * lam * (lam_ret - next_q)
        lam_ret = (1.0 - d) * lam_ret + d * r
        out_ref[pl.ds(t, 1), :] = lam_ret
        return (lam_ret, maxq_ref[pl.ds(t, 1), :])

    jax.lax.fori_loop(0, T - 1, body, (boot, last_q))


@partial(jax.jit, static_argnames=("gamma", "lam", "interpret"))
def lambda_returns_pallas(
    last_q: jax.Array,
    rewards: jax.Array,
    dones: jax.Array,
    max_qs: jax.Array,
    gamma: float,
    lam: float,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for algo.returns.lambda_returns on TPU."""
    T, E = rewards.shape
    # pad the env axis to the 128-lane vector width
    pad = (-E) % 128
    if pad:
        zeros_row = jnp.zeros((T, pad), rewards.dtype)
        rewards = jnp.concatenate([rewards, zeros_row], axis=1)
        dones = jnp.concatenate([dones.astype(rewards.dtype), zeros_row], axis=1)
        max_qs = jnp.concatenate([max_qs, zeros_row], axis=1)
        last_q = jnp.concatenate([last_q, jnp.zeros((pad,), last_q.dtype)])
    else:
        dones = dones.astype(rewards.dtype)

    out = pl.pallas_call(
        partial(_lambda_kernel, gamma=gamma, lam=lam),
        out_shape=jax.ShapeDtypeStruct(rewards.shape, rewards.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(rewards, dones, max_qs, last_q[jnp.newaxis, :])
    return out[:, :E] if pad else out
