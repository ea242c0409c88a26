"""Minimal space types (gymnax-style) for the functional env protocol."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


class Space:
    def sample(self, key: jax.Array) -> jax.Array:
        raise NotImplementedError

    def contains(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError


class Discrete(Space):
    def __init__(self, n: int, dtype=jnp.int32):
        self.n = int(n)
        self.shape = ()
        self.dtype = dtype

    def sample(self, key: jax.Array) -> jax.Array:
        return jax.random.randint(key, (), 0, self.n, dtype=self.dtype)

    def contains(self, x) -> jax.Array:
        return jnp.logical_and(x >= 0, x < self.n)

    def __repr__(self):
        return f"Discrete({self.n})"


class Box(Space):
    def __init__(self, low, high, shape: Sequence[int], dtype=jnp.float32):
        self.low = low
        self.high = high
        self.shape = tuple(shape)
        self.dtype = dtype

    def sample(self, key: jax.Array) -> jax.Array:
        low = np.broadcast_to(np.asarray(self.low, dtype=np.float32), self.shape)
        high = np.broadcast_to(np.asarray(self.high, dtype=np.float32), self.shape)
        finite = np.isfinite(low) & np.isfinite(high)
        lo = np.where(finite, low, -1.0)
        hi = np.where(finite, high, 1.0)
        return jax.random.uniform(
            key, self.shape, minval=lo, maxval=hi, dtype=self.dtype
        )

    def contains(self, x) -> jax.Array:
        return jnp.logical_and(jnp.all(x >= self.low), jnp.all(x <= self.high))

    def __repr__(self):
        return f"Box(shape={self.shape})"


class Dict(Space):
    """Dict of named subspaces (used by multi-agent envs)."""

    def __init__(self, spaces: dict):
        self.spaces = dict(spaces)

    def sample(self, key: jax.Array):
        keys = jax.random.split(key, len(self.spaces))
        return {
            name: space.sample(k)
            for (name, space), k in zip(self.spaces.items(), keys)
        }

    def __getitem__(self, name):
        return self.spaces[name]

    def __repr__(self):
        return f"Dict({list(self.spaces)})"
