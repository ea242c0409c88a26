"""wrap_for_brax_training: a brax-style batched view of an in-tree env.

The reference's PlaygroundVecGymnaxWrapper consumes exactly:
  env.reset(keys) -> State  (keys: (E, 2) key vector)
  env.step(state, action) -> State  (NO key — brax protocol)
  env.action_size / env.observation_size

State carries (obs, reward, done, inner env state). Per-step keys don't
exist in this protocol; step uses a fixed key through the in-tree env's
step fn — identical to the keyed path until the first auto-reset draw
matters (episode boundary), which the parity test stays inside of.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class State:
    obs: Any
    reward: jnp.ndarray
    done: jnp.ndarray
    inner: Any
    info: Any


class Wrapper:
    """Base wrapper (imported by brax_wrappers as PlaygroundWrapper)."""

    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)


class _BraxTrainingView:
    def __init__(self, env, episode_length, action_repeat=1):
        self._env = env
        self._params = env.default_params
        self.episode_length = episode_length
        self.action_repeat = action_repeat
        self.action_size = int(
            np.prod(env.action_space(self._params).shape)
        )
        self.observation_size = int(
            np.prod(env.observation_space(self._params).shape)
        )

    def reset(self, keys):
        obs, inner = jax.vmap(self._env.reset, in_axes=(0, None))(
            keys, self._params
        )
        n = obs.shape[0]
        return State(
            obs=obs,
            reward=jnp.zeros((n,)),
            done=jnp.zeros((n,)),
            inner=inner,
            info={},
        )

    def step(self, state, action):
        n = state.obs.shape[0]
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        obs, inner, reward, done, info = jax.vmap(
            self._env.step, in_axes=(0, 0, 0, None)
        )(keys, state.inner, action, self._params)
        return State(
            obs=obs,
            reward=reward,
            done=done.astype(jnp.float32),
            inner=inner,
            info=state.info,
        )


def wrap_for_brax_training(env, episode_length=1000, action_repeat=1):
    return _BraxTrainingView(env, episode_length, action_repeat)
