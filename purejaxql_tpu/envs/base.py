"""Functional environment protocol for TPU-native RL.

Every environment is a pure-function pair ``reset(key, params)`` /
``step(key, state, action, params)`` whose state is a pytree of static-shape
arrays, so whole rollouts compile into a single XLA program (``vmap`` over the
env batch, ``lax.scan`` over time). The API mirrors the gymnax protocol the
reference consumes (see /root/reference/purejaxql/pqn_gymnax.py:99-104 and
/root/reference/purejaxql/utils/craftax_wrappers.py:32-45) but is implemented
from scratch here because this framework ships its own environments.

Auto-reset semantics: ``step`` always computes both the stepped state and a
fresh reset state and selects between them with ``lax.select`` on ``done`` —
branchless, so the scan body stays a single fused XLA computation.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Generic, Tuple, TypeVar

import jax
from flax import struct

from purejaxql_tpu.envs import spaces

TEnvState = TypeVar("TEnvState", bound="EnvState")
TEnvParams = TypeVar("TEnvParams", bound="EnvParams")


@struct.dataclass
class EnvState:
    time: jax.Array


@struct.dataclass
class EnvParams:
    max_steps_in_episode: int = struct.field(pytree_node=False, default=500)


class Environment(Generic[TEnvState, TEnvParams]):
    """Base class: subclasses implement ``reset_env``/``step_env``/spaces."""

    @property
    def default_params(self) -> TEnvParams:
        raise NotImplementedError

    @property
    def name(self) -> str:
        return type(self).__name__

    # -- public API (auto-resetting) -------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def reset(
        self, key: jax.Array, params: TEnvParams | None = None
    ) -> Tuple[jax.Array, TEnvState]:
        if params is None:
            params = self.default_params
        return self.reset_env(key, params)

    @partial(jax.jit, static_argnames=("self",))
    def step(
        self,
        key: jax.Array,
        state: TEnvState,
        action: jax.Array,
        params: TEnvParams | None = None,
    ) -> Tuple[jax.Array, TEnvState, jax.Array, jax.Array, dict]:
        """Step with auto-reset on episode end.

        Key discipline matches the gymnax protocol the reference relies on:
        the incoming key is split once, the first half drives the transition
        and the second half seeds the reset state (used only when ``done``).
        """
        if params is None:
            params = self.default_params
        key, key_reset = jax.random.split(key)
        obs_st, state_st, reward, done, info = self.step_env(key, state, action, params)
        obs_re, state_re = self.reset_env(key_reset, params)
        state = jax.tree_util.tree_map(
            lambda re, st: jax.lax.select(done, re, st), state_re, state_st
        )
        obs = jax.lax.select(done, obs_re, obs_st)
        return obs, state, reward, done, info

    # -- to implement ----------------------------------------------------

    def reset_env(
        self, key: jax.Array, params: TEnvParams
    ) -> Tuple[jax.Array, TEnvState]:
        raise NotImplementedError

    def step_env(
        self,
        key: jax.Array,
        state: TEnvState,
        action: jax.Array,
        params: TEnvParams,
    ) -> Tuple[jax.Array, TEnvState, jax.Array, jax.Array, dict]:
        raise NotImplementedError

    def observation_space(self, params: TEnvParams) -> spaces.Space:
        raise NotImplementedError

    def action_space(self, params: TEnvParams) -> spaces.Space:
        raise NotImplementedError

    @property
    def num_actions(self) -> int:
        space = self.action_space(self.default_params)
        if isinstance(space, spaces.Discrete):
            return space.n
        raise ValueError(f"{self.name} has a continuous action space")


class Wrapper(Environment):
    """Attribute-forwarding wrapper base (reference: craftax_wrappers.py:10-18)."""

    def __init__(self, env: Environment):
        self._env = env

    def __getattr__(self, name: str) -> Any:
        return getattr(self._env, name)

    # Wrappers delegate by default — they must NOT inherit Environment's
    # auto-resetting reset/step, which would re-apply auto-reset and
    # bypass vectorized inner wrappers.
    def reset(self, key, params=None):
        return self._env.reset(key, params)

    def step(self, key, state, action, params=None):
        return self._env.step(key, state, action, params)

    @property
    def default_params(self):
        return self._env.default_params

    def reset_env(self, key, params):
        return self._env.reset_env(key, params)

    def step_env(self, key, state, action, params):
        return self._env.step_env(key, state, action, params)

    def observation_space(self, params):
        return self._env.observation_space(params)

    def action_space(self, params):
        return self._env.action_space(params)
