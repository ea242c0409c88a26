"""Breakout-MinAtar in pure JAX.

Faithful re-implementation of MinAtar Breakout (Young & Tian, arXiv
1903.03176) semantics on a 10x10 grid with 4 observation channels
[paddle, ball, trail, brick] and the minimal 3-action set [noop, left,
right]. The env family the reference benchmarks CNN-PQN on via gymnax
(/root/reference/purejaxql/pqn_minatar.py, config ENV_NAME *-MinAtar).

All branching is `jnp.where`-based so thousands of envs vmap into dense
VPU code under one jit.

Game rules: the ball moves diagonally (4 directions); it bounces off side
walls (x-reflect), the ceiling (y-reflect), bricks (y-reflect, brick
removed, +1 reward, with a one-step strike latch so a single strike can't
double-count), and the paddle (y-reflect when directly above, diagonal
re-aim when caught at the corner). Missing the paddle at the bottom row
terminates. Clearing all bricks respawns the 3-row wall.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class BreakoutState:
    ball_y: jax.Array
    ball_x: jax.Array
    ball_dir: jax.Array
    pos: jax.Array
    brick_map: jax.Array
    strike: jax.Array
    last_y: jax.Array
    last_x: jax.Array
    terminal: jax.Array
    time: jax.Array


@struct.dataclass
class BreakoutParams:
    max_steps_in_episode: int = struct.field(pytree_node=False, default=1000)


# direction -> (dx, dy); 0: up-left, 1: up-right, 2: down-right, 3: down-left
_DX = jnp.array([-1, 1, 1, -1])
_DY = jnp.array([-1, -1, 1, 1])
_BOUNCE_X = jnp.array([1, 0, 3, 2])  # side-wall reflection
_BOUNCE_Y = jnp.array([3, 2, 1, 0])  # ceiling/brick/paddle reflection
_BOUNCE_CORNER = jnp.array([2, 3, 0, 1])  # paddle-corner reflection


class MinBreakout(Environment):
    @property
    def default_params(self) -> BreakoutParams:
        return BreakoutParams()

    @property
    def name(self) -> str:
        return "Breakout-MinAtar"

    def reset_env(self, key, params):
        ball_start = jax.random.randint(key, (), 0, 2)
        brick_map = jnp.zeros((10, 10), dtype=jnp.int32).at[1:4, :].set(1)
        state = BreakoutState(
            ball_y=jnp.asarray(3, jnp.int32),
            ball_x=jnp.where(ball_start == 0, 0, 9).astype(jnp.int32),
            ball_dir=jnp.where(ball_start == 0, 2, 3).astype(jnp.int32),
            pos=jnp.asarray(4, jnp.int32),
            brick_map=brick_map,
            strike=jnp.asarray(False),
            last_y=jnp.asarray(3, jnp.int32),
            last_x=jnp.where(ball_start == 0, 0, 9).astype(jnp.int32),
            terminal=jnp.asarray(False),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state), state

    def step_env(self, key, state, action, params):
        # paddle: action 1 = left, 2 = right
        pos = jnp.clip(
            state.pos + jnp.where(action == 1, -1, jnp.where(action == 2, 1, 0)),
            0,
            9,
        )

        last_x, last_y = state.ball_x, state.ball_y
        new_x = state.ball_x + _DX[state.ball_dir]
        new_y = state.ball_y + _DY[state.ball_dir]
        d = state.ball_dir

        # side walls
        hit_wall = jnp.logical_or(new_x < 0, new_x > 9)
        new_x = jnp.clip(new_x, 0, 9)
        d = jnp.where(hit_wall, _BOUNCE_X[d], d)

        # ceiling
        hit_ceiling = new_y < 0
        new_y = jnp.maximum(new_y, 0)
        d = jnp.where(hit_ceiling, _BOUNCE_Y[d], d)

        # brick strike (latched: no reward while `strike` is held)
        hit_brick = state.brick_map[new_y, new_x] == 1
        scored = jnp.logical_and(hit_brick, jnp.logical_not(state.strike))
        reward = scored.astype(jnp.float32)
        brick_map = jnp.where(
            scored,
            state.brick_map.at[new_y, new_x].set(0),
            state.brick_map,
        )
        d = jnp.where(scored, _BOUNCE_Y[d], d)
        new_y = jnp.where(scored, last_y, new_y)

        # bottom row: paddle or death
        at_bottom = jnp.logical_and(new_y == 9, jnp.logical_not(hit_brick))
        # respawn the wall when cleared
        brick_map = jnp.where(
            jnp.logical_and(at_bottom, brick_map.sum() == 0),
            brick_map.at[1:4, :].set(1),
            brick_map,
        )
        caught_above = jnp.logical_and(at_bottom, state.ball_x == pos)
        caught_corner = jnp.logical_and(
            jnp.logical_and(at_bottom, jnp.logical_not(caught_above)), new_x == pos
        )
        missed = jnp.logical_and(
            at_bottom,
            jnp.logical_not(jnp.logical_or(caught_above, caught_corner)),
        )
        d = jnp.where(caught_above, _BOUNCE_Y[d], d)
        d = jnp.where(caught_corner, _BOUNCE_CORNER[d], d)
        new_y = jnp.where(jnp.logical_or(caught_above, caught_corner), last_y, new_y)

        strike = jnp.where(hit_brick, scored | state.strike, False)

        new_state = BreakoutState(
            ball_y=new_y.astype(jnp.int32),
            ball_x=new_x.astype(jnp.int32),
            ball_dir=d.astype(jnp.int32),
            pos=pos.astype(jnp.int32),
            brick_map=brick_map,
            strike=strike,
            last_y=last_y,
            last_x=last_x,
            terminal=missed,
            time=state.time + 1,
        )
        done = self.is_terminal(new_state, params)
        return (
            jax.lax.stop_gradient(self.get_obs(new_state)),
            jax.lax.stop_gradient(new_state),
            reward,
            done,
            {},
        )

    def get_obs(self, state: BreakoutState) -> jax.Array:
        obs = jnp.zeros((10, 10, 4), dtype=jnp.float32)
        obs = obs.at[9, state.pos, 0].set(1.0)
        obs = obs.at[state.ball_y, state.ball_x, 1].set(1.0)
        obs = obs.at[state.last_y, state.last_x, 2].set(1.0)
        obs = obs.at[:, :, 3].set(state.brick_map.astype(jnp.float32))
        return obs

    def is_terminal(self, state, params):
        return jnp.logical_or(
            state.terminal, state.time >= params.max_steps_in_episode
        )

    def observation_space(self, params):
        return spaces.Box(0.0, 1.0, (10, 10, 4), jnp.float32)

    def action_space(self, params=None):
        return spaces.Discrete(3)
