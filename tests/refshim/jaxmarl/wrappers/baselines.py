"""baselines wrapper surface the reference imports
(pqn_vdn_rnn_jaxmarl.py:21-26): LogWrapper family + CTRolloutManager.

Semantics mirror the in-tree `purejaxql_tpu.envs.marl.base` pair
(MARLLogWrapper + CTRolloutManager) exactly — team-reward episode
accounting, split(key, batch) vmapped reset/step, valid-action queries on
the inner state — with the one structural difference the reference script
relies on: the log state is an attribute-style dataclass so
`env_state.env_state` resolves (pqn_vdn_rnn_jaxmarl.py:271).

`batch_sample` draws masked-uniform random actions with the same key
discipline as the in-tree engine's eps=1 exploration
(algo/pqn_vdn.py masked_eps_greedy): split(key) -> per-env split ->
jax.random.choice over the uniform action distribution. For all-legal
envs (MPE Spread) this makes the reference's random prefill
(pqn_vdn_rnn_jaxmarl.py:612-615) draw the exact same actions as ours.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class LogEnvState:
    env_state: Any
    episode_returns: jnp.ndarray
    episode_lengths: jnp.ndarray
    returned_episode_returns: jnp.ndarray
    returned_episode_lengths: jnp.ndarray


class LogWrapper:
    def __init__(self, env, replace_info: bool = False):
        self._env = env

    def __getattr__(self, name):
        return getattr(self._env, name)

    def reset(self, key):
        obs, env_state = self._env.reset(key)
        zero = jnp.asarray(0.0)
        zero_i = jnp.asarray(0, jnp.int32)
        return obs, LogEnvState(env_state, zero, zero_i, zero, zero_i)

    def step(self, key, state, actions):
        obs, env_state, rewards, dones, info = self._env.step(
            key, state.env_state, actions
        )
        done = dones["__all__"]
        new_ret = state.episode_returns + rewards["__all__"]
        new_len = state.episode_lengths + 1
        not_done = 1 - done
        state = LogEnvState(
            env_state,
            new_ret * not_done,
            new_len * not_done.astype(jnp.int32),
            state.returned_episode_returns * not_done + new_ret * done,
            state.returned_episode_lengths * not_done.astype(jnp.int32)
            + new_len * done.astype(jnp.int32),
        )
        info = dict(info)
        info["returned_episode_returns"] = state.returned_episode_returns
        info["returned_episode_lengths"] = state.returned_episode_lengths
        info["returned_episode"] = done
        return obs, state, rewards, dones, info

    def get_avail_actions(self, state):
        return self._env.get_avail_actions(state.env_state)


# the reference distinguishes these per env family; accounting is shared
MPELogWrapper = LogWrapper
SMAXLogWrapper = LogWrapper


class CTRolloutManager:
    """Batched rollout manager over a (Log-wrapped) in-tree MultiAgentEnv.

    `preprocess_obs` is accepted and ignored: jaxmarl uses it to pad
    heterogeneous per-agent obs/action spaces to a common size; the in-tree
    MARL envs are homogeneous, so preprocessing is the identity.
    """

    def __init__(self, env, batch_size: int, preprocess_obs: bool = True):
        self._env = env
        self.batch_size = batch_size
        self.agents = env.agents
        self.num_agents = env.num_agents
        self.max_action_space = max(
            env.action_space(a).n for a in env.agents
        )
        # plain-python math: the reference constructs this inside its traced
        # train fn (pqn_vdn_rnn_jaxmarl.py:182)
        self.obs_size = max(
            int(np.prod(env.observation_space(a).shape)) for a in env.agents
        )

    def batch_reset(self, key):
        keys = jax.random.split(key, self.batch_size)
        return jax.vmap(self._env.reset)(keys)

    def batch_step(self, key, state, actions):
        keys = jax.random.split(key, self.batch_size)
        return jax.vmap(self._env.step)(keys, state, actions)

    def get_valid_actions(self, state):
        # called with the INNER (pre-log) batched state
        # (pqn_vdn_rnn_jaxmarl.py:271)
        inner = getattr(self._env, "_env", self._env)
        return jax.vmap(inner.get_avail_actions)(state)

    def batch_sample(self, key, agent):
        n = self._env.action_space(agent).n
        rng_a, _rng_e = jax.random.split(key)
        keys = jax.random.split(rng_a, self.batch_size)
        valid = jnp.ones(n)
        p = valid * 1.0 / jnp.sum(valid, axis=-1)
        return jax.vmap(
            lambda k: jax.random.choice(k, jnp.arange(n), p=p)
        )(keys)


def save_params(params, path):
    from purejaxql_tpu.core.checkpoint import save_params as _save

    _save(params, path)
