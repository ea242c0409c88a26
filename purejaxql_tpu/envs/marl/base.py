"""Multi-agent env protocol (jaxmarl-style) + the batched rollout manager.

The reference consumes JaxMARL through `CTRolloutManager`
(/root/reference/purejaxql/pqn_vdn_rnn_jaxmarl.py:182-189): dict-keyed
per-agent obs/actions, a shared "__all__" reward/done, legal-action masks,
and an internally-vmapped batch of envs. This module defines the same
surface for this package's own JAX-native MARL envs.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from purejaxql_tpu.envs import spaces


class MultiAgentEnv:
    """Functional multi-agent env: dict obs/actions keyed by agent name."""

    agents: List[str]
    num_agents: int

    def reset(self, key: jax.Array) -> Tuple[Dict, object]:
        raise NotImplementedError

    def step(
        self, key: jax.Array, state, actions: Dict
    ) -> Tuple[Dict, object, Dict, Dict, Dict]:
        """Returns (obs, state, rewards, dones, infos); rewards/dones carry
        an "__all__" entry (team reward / episode end)."""
        raise NotImplementedError

    def get_avail_actions(self, state) -> Dict:
        """Legal-action mask per agent (defaults to all-legal)."""
        return {
            agent: jnp.ones(self.action_space(agent).n) for agent in self.agents
        }

    def observation_space(self, agent: str) -> spaces.Space:
        raise NotImplementedError

    def action_space(self, agent: str) -> spaces.Space:
        raise NotImplementedError


class MARLLogWrapper(MultiAgentEnv):
    """Episode accounting for multi-agent envs: tracks the team ("__all__")
    return/length and emits returned_episode_* info keys on episode end."""

    def __init__(self, env: MultiAgentEnv):
        self._env = env
        self.agents = env.agents
        self.num_agents = env.num_agents

    def __getattr__(self, name):
        return getattr(self._env, name)

    def reset(self, key):
        obs, env_state = self._env.reset(key)
        zero = jnp.asarray(0.0)
        zero_i = jnp.asarray(0, jnp.int32)
        return obs, (env_state, zero, zero_i, zero, zero_i)

    def step(self, key, state, actions):
        env_state, ep_ret, ep_len, ret_ret, ret_len = state
        obs, env_state, rewards, dones, info = self._env.step(
            key, env_state, actions
        )
        done = dones["__all__"]
        new_ret = ep_ret + rewards["__all__"]
        new_len = ep_len + 1
        not_done = 1 - done
        state = (
            env_state,
            new_ret * not_done,
            new_len * not_done.astype(jnp.int32),
            ret_ret * not_done + new_ret * done,
            ret_len * not_done.astype(jnp.int32)
            + new_len * done.astype(jnp.int32),
        )
        info = dict(info)
        info["returned_episode_returns"] = state[3]
        info["returned_episode_lengths"] = state[4]
        info["returned_episode"] = done
        return obs, state, rewards, dones, info

    def get_avail_actions(self, state):
        return self._env.get_avail_actions(state[0])

    def observation_space(self, agent: str):
        return self._env.observation_space(agent)

    def action_space(self, agent: str):
        return self._env.action_space(agent)


class CTRolloutManager:
    """Centralized-training rollout manager: vmaps a MultiAgentEnv over a
    batch of `batch_size` parallel instances with internal key splitting,
    exposing batched reset/step and valid-action queries (reference:
    jaxmarl's CTRolloutManager consumed at pqn_vdn_rnn_jaxmarl.py:182-282).
    """

    def __init__(self, env: MultiAgentEnv, batch_size: int):
        self._env = env
        self.batch_size = batch_size
        self.agents = env.agents
        self.num_agents = env.num_agents
        self.max_action_space = max(
            env.action_space(a).n for a in env.agents
        )
        self.obs_size = max(
            int(jnp.prod(jnp.asarray(env.observation_space(a).shape)))
            for a in env.agents
        )

    def batch_reset(self, key: jax.Array):
        keys = jax.random.split(key, self.batch_size)
        return jax.vmap(self._env.reset)(keys)

    def batch_step(self, key: jax.Array, state, actions: Dict):
        keys = jax.random.split(key, self.batch_size)
        return jax.vmap(self._env.step)(keys, state, actions)

    def get_valid_actions(self, state):
        return jax.vmap(self._env.get_avail_actions)(state)
