"""MemoryChain (bsuite-style) — a pure-memory task for recurrent agents.

At t=0 the agent observes a random context bit; afterwards the observation
carries no context. At the final step the agent must output the remembered
bit. Reward +1 for a correct recall, -1 otherwise, 0 elsewhere. This is the
RNN sanity env the reference runs via gymnax's `MemoryChain-bsuite`
(/root/reference/purejaxql/config/alg/pqn_rnn_memory_chain.yaml); a
feedforward policy cannot beat chance on it, a recurrent one can solve it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class MemoryChainState:
    context: jax.Array
    query: jax.Array
    total_perfect: jax.Array
    total_regret: jax.Array
    time: jax.Array


@struct.dataclass
class MemoryChainParams:
    memory_length: int = struct.field(pytree_node=False, default=5)
    num_bits: int = struct.field(pytree_node=False, default=1)
    max_steps_in_episode: int = struct.field(pytree_node=False, default=1000)


class MemoryChain(Environment):
    @property
    def default_params(self) -> MemoryChainParams:
        return MemoryChainParams()

    @property
    def name(self) -> str:
        return "MemoryChain-bsuite"

    def reset_env(self, key, params):
        key_c, key_q = jax.random.split(key)
        context = jax.random.bernoulli(key_c, 0.5, (params.num_bits,)).astype(
            jnp.int32
        )
        query = jax.random.randint(key_q, (), 0, params.num_bits)
        state = MemoryChainState(
            context=context,
            query=query,
            total_perfect=jnp.asarray(0, jnp.int32),
            total_regret=jnp.asarray(0.0),
            time=jnp.asarray(0, dtype=jnp.int32),
        )
        return self.get_obs(state, params), state

    def step_env(self, key, state, action, params):
        at_final = state.time == params.memory_length - 1
        correct = action == state.context[state.query]
        reward = jnp.where(at_final, jnp.where(correct, 1.0, -1.0), 0.0)
        new_state = state.replace(
            time=state.time + 1,
            total_perfect=state.total_perfect + (at_final & correct),
            total_regret=state.total_regret + jnp.where(at_final & ~correct, 2.0, 0.0),
        )
        done = new_state.time >= params.memory_length
        return (
            self.get_obs(new_state, params),
            new_state,
            jnp.asarray(reward, dtype=jnp.float32),
            done,
            {},
        )

    def get_obs(self, state, params):
        # [time fraction, query (revealed on last step), context (t=0 only)]
        obs_front = jnp.array(
            [
                state.time / params.memory_length,
                jnp.where(
                    state.time == params.memory_length - 1, state.query, 0
                ).astype(jnp.float32),
            ]
        )
        context = jnp.where(state.time == 0, 2 * state.context - 1, 0).astype(
            jnp.float32
        )
        return jnp.concatenate([obs_front, context])

    def observation_space(self, params):
        n = 2 + params.num_bits
        return spaces.Box(-1.0, params.num_bits, (n,), jnp.float32)

    def action_space(self, params=None):
        return spaces.Discrete(2)
