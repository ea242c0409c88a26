"""Spread: a cooperative multi-agent coverage env (MPE simple-spread-class).

N homogeneous agents move on the [-1, 1]^2 plane and must jointly cover N
landmarks; the team reward is the negative sum over landmarks of the
distance to the closest agent, minus a collision penalty. Discrete 5-action
control (noop + 4 impulses), 25-step episodes, auto-reset at the horizon.
This is the in-tree cooperative benchmark exercising the VDN-PQN engine
(the reference uses JaxMARL SMAX/MPE/Overcooked, pqn_vdn_rnn_jaxmarl.py
:654-680).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.marl.base import MultiAgentEnv


@struct.dataclass
class SpreadState:
    agent_pos: jax.Array  # (N, 2)
    agent_vel: jax.Array  # (N, 2)
    landmark_pos: jax.Array  # (N, 2)
    time: jax.Array


_IMPULSE = jnp.array(
    [[0.0, 0.0], [-1.0, 0.0], [1.0, 0.0], [0.0, -1.0], [0.0, 1.0]]
)


class Spread(MultiAgentEnv):
    def __init__(
        self,
        num_agents: int = 3,
        max_steps: int = 25,
        dt: float = 0.1,
        damping: float = 0.25,
        accel: float = 3.0,
        collision_radius: float = 0.1,
    ):
        # dynamics are MPE-scale: steady-state speed accel*dt/damping = 1.2
        # units/s, so an agent crosses the [-1,1]^2 arena within one
        # 25-step episode — the coverage reward is controllable.
        self.num_agents = num_agents
        self.agents = [f"agent_{i}" for i in range(num_agents)]
        self.max_steps = max_steps
        self.dt = dt
        self.damping = damping
        self.accel = accel
        self.collision_radius = collision_radius
        # obs: own pos+vel, landmarks relative, other agents relative
        self.obs_dim = 4 + 2 * num_agents + 2 * (num_agents - 1)

    def reset(self, key: jax.Array):
        k_a, k_l = jax.random.split(key)
        state = SpreadState(
            agent_pos=jax.random.uniform(
                k_a, (self.num_agents, 2), minval=-1.0, maxval=1.0
            ),
            agent_vel=jnp.zeros((self.num_agents, 2)),
            landmark_pos=jax.random.uniform(
                k_l, (self.num_agents, 2), minval=-1.0, maxval=1.0
            ),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state), state

    def step(self, key: jax.Array, state: SpreadState, actions: Dict):
        acts = jnp.stack([actions[a] for a in self.agents])
        impulse = _IMPULSE[acts] * self.accel
        vel = state.agent_vel * (1 - self.damping) + impulse * self.dt
        pos = jnp.clip(state.agent_pos + vel * self.dt, -1.2, 1.2)

        # team reward: coverage + collision penalty
        d = jnp.linalg.norm(
            pos[None, :, :] - state.landmark_pos[:, None, :], axis=-1
        )  # (landmark, agent)
        coverage = -d.min(axis=1).sum()
        aa = jnp.linalg.norm(pos[None, :, :] - pos[:, None, :], axis=-1)
        ncol = (
            (aa < 2 * self.collision_radius).sum()
            - self.num_agents  # self-distances
        ) / 2
        reward = coverage - 0.5 * ncol

        new_time = state.time + 1
        done = new_time >= self.max_steps

        stepped = SpreadState(
            agent_pos=pos,
            agent_vel=vel,
            landmark_pos=state.landmark_pos,
            time=new_time,
        )
        # auto-reset at the horizon
        obs_re, state_re = self.reset(key)
        new_state = jax.tree_util.tree_map(
            lambda re, st: jax.lax.select(done, re, st), state_re, stepped
        )
        obs_st = self.get_obs(stepped)
        obs = jax.tree_util.tree_map(
            lambda re, st: jax.lax.select(done, re, st), obs_re, obs_st
        )

        rewards = {a: reward for a in self.agents}
        rewards["__all__"] = reward
        dones = {a: done for a in self.agents}
        dones["__all__"] = done
        return obs, new_state, rewards, dones, {}

    def get_obs(self, state: SpreadState) -> Dict:
        def single(i):
            rel_land = (state.landmark_pos - state.agent_pos[i]).reshape(-1)
            others = jnp.concatenate(
                [state.agent_pos[:i], state.agent_pos[i + 1:]], axis=0
            )
            rel_others = (others - state.agent_pos[i]).reshape(-1)
            return jnp.concatenate(
                [state.agent_pos[i], state.agent_vel[i], rel_land, rel_others]
            )

        return {a: single(i) for i, a in enumerate(self.agents)}

    def observation_space(self, agent: str) -> spaces.Box:
        return spaces.Box(-2.0, 2.0, (self.obs_dim,), jnp.float32)

    def action_space(self, agent: str) -> spaces.Discrete:
        return spaces.Discrete(5)
