"""Freeway-MinAtar in pure JAX.

MinAtar Freeway semantics: a chicken (fixed column 4) crosses 8 lanes of
traffic from the bottom row to the top; reaching the top scores +1 and
re-randomizes car speeds; being hit sends it back to the start. Movement
has a 3-step cooldown; the episode ends on a 2500-step time limit. 7 obs
channels [chicken, car, speed1..speed5]; minimal 3-action set
[noop, up, down].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class FreewayState:
    pos: jax.Array  # chicken row
    car_x: jax.Array  # (8,)
    car_timer: jax.Array  # (8,) steps until the car moves
    car_speed: jax.Array  # (8,) signed: sign = direction, |.| = interval
    move_timer: jax.Array
    terminal: jax.Array
    time: jax.Array


@struct.dataclass
class FreewayParams:
    player_speed: int = struct.field(pytree_node=False, default=3)
    max_steps_in_episode: int = struct.field(pytree_node=False, default=2500)


def _randomize_cars(key, old_x=None):
    k_speed, k_dir, k_x = jax.random.split(key, 3)
    speeds = jax.random.randint(k_speed, (8,), 1, 6)
    dirs = jnp.where(jax.random.bernoulli(k_dir, 0.5, (8,)), 1, -1)
    signed = speeds * dirs
    x = (
        jax.random.randint(k_x, (8,), 0, 10)
        if old_x is None
        else old_x
    )
    return x, speeds, signed


class MinFreeway(Environment):
    @property
    def default_params(self) -> FreewayParams:
        return FreewayParams()

    @property
    def name(self) -> str:
        return "Freeway-MinAtar"

    def reset_env(self, key, params):
        car_x, car_timer, car_speed = _randomize_cars(key)
        state = FreewayState(
            pos=jnp.asarray(9, jnp.int32),
            car_x=car_x.astype(jnp.int32),
            car_timer=car_timer.astype(jnp.int32),
            car_speed=car_speed.astype(jnp.int32),
            move_timer=jnp.asarray(0, jnp.int32),
            terminal=jnp.asarray(False),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state), state

    def step_env(self, key, state, action, params):
        # actions: 0 noop, 1 up, 2 down
        can_move = state.move_timer == 0
        wants_move = action != 0
        moved = jnp.logical_and(can_move, wants_move)
        pos = jnp.clip(
            state.pos
            + jnp.where(
                moved, jnp.where(action == 1, -1, 1), 0
            ),
            0,
            9,
        )
        move_timer = jnp.where(
            moved, params.player_speed, jnp.maximum(state.move_timer - 1, 0)
        )

        # scored: reached the top
        scored = pos == 0
        reward = scored.astype(jnp.float32)
        _, new_timer, new_speed = _randomize_cars(key, old_x=state.car_x)
        car_timer = jnp.where(scored, new_timer, state.car_timer)
        car_speed = jnp.where(scored, new_speed, state.car_speed)
        pos = jnp.where(scored, 9, pos)

        # car movement (per-lane timers) + collision at column 4
        rows = jnp.arange(1, 9)
        hit_before = jnp.logical_and(state.car_x == 4, rows == pos).any()
        do_move = car_timer <= 0
        new_x = state.car_x + jnp.where(car_speed > 0, 1, -1)
        new_x = jnp.where(new_x < 0, 9, jnp.where(new_x > 9, 0, new_x))
        car_x = jnp.where(do_move, new_x, state.car_x)
        car_timer = jnp.where(do_move, jnp.abs(car_speed), car_timer - 1)
        hit_after = jnp.logical_and(car_x == 4, rows == pos).any()
        pos = jnp.where(jnp.logical_or(hit_before, hit_after), 9, pos)

        new_state = FreewayState(
            pos=pos.astype(jnp.int32),
            car_x=car_x,
            car_timer=car_timer,
            car_speed=car_speed,
            move_timer=move_timer,
            terminal=jnp.asarray(False),
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

    def get_obs(self, state: FreewayState) -> jax.Array:
        obs = jnp.zeros((10, 10, 7), dtype=jnp.float32)
        obs = obs.at[state.pos, 4, 0].set(1.0)
        rows = jnp.arange(1, 9)
        obs = obs.at[rows, state.car_x, 1].set(1.0)
        # speed trail behind each car, channel indexed by |speed| (1..5)
        back_x = state.car_x + jnp.where(state.car_speed > 0, -1, 1)
        back_x = jnp.where(back_x < 0, 9, jnp.where(back_x > 9, 0, back_x))
        speed_channel = 1 + jnp.abs(state.car_speed)  # 2..6
        obs = obs.at[rows, back_x, speed_channel].set(1.0)
        return obs

    def is_terminal(self, state, params):
        return state.time >= params.max_steps_in_episode

    def observation_space(self, params):
        return spaces.Box(0.0, 1.0, (10, 10, 7), jnp.float32)

    def action_space(self, params=None):
        return spaces.Discrete(3)
