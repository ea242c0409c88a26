"""Asterix-MinAtar in pure JAX.

MinAtar Asterix semantics (arXiv 1903.03176): the player moves in 4
directions on a 10x10 grid; entities (enemies or gold) spawn on rows 1-8
moving horizontally; touching gold scores +1, touching an enemy ends the
episode. Spawn and movement cadence ramp up over time. Minimal 5-action set
[noop, left, up, right, down]; 4 obs channels [player, enemy, trail, gold]
with the trail marking each entity's direction of travel.

Entity storage is 8 fixed slots (one per row) of (exists, x, lr, is_gold)
arrays — static shapes, fully vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class AsterixState:
    player_x: jax.Array
    player_y: jax.Array
    e_exists: jax.Array  # (8,) bool
    e_x: jax.Array  # (8,) int32
    e_lr: jax.Array  # (8,) bool: True = moving right
    e_gold: jax.Array  # (8,) bool
    spawn_speed: jax.Array
    spawn_timer: jax.Array
    move_speed: jax.Array
    move_timer: jax.Array
    ramp_timer: jax.Array
    ramp_index: jax.Array
    terminal: jax.Array
    time: jax.Array


@struct.dataclass
class AsterixParams:
    ramp_interval: int = struct.field(pytree_node=False, default=100)
    init_spawn_speed: int = struct.field(pytree_node=False, default=10)
    init_move_interval: int = struct.field(pytree_node=False, default=5)
    ramping: bool = struct.field(pytree_node=False, default=True)
    max_steps_in_episode: int = struct.field(pytree_node=False, default=1000)


class MinAsterix(Environment):
    @property
    def default_params(self) -> AsterixParams:
        return AsterixParams()

    @property
    def name(self) -> str:
        return "Asterix-MinAtar"

    def reset_env(self, key, params):
        state = AsterixState(
            player_x=jnp.asarray(5, jnp.int32),
            player_y=jnp.asarray(5, jnp.int32),
            e_exists=jnp.zeros(8, bool),
            e_x=jnp.zeros(8, jnp.int32),
            e_lr=jnp.zeros(8, bool),
            e_gold=jnp.zeros(8, bool),
            spawn_speed=jnp.asarray(params.init_spawn_speed, jnp.int32),
            spawn_timer=jnp.asarray(params.init_spawn_speed, jnp.int32),
            move_speed=jnp.asarray(params.init_move_interval, jnp.int32),
            move_timer=jnp.asarray(params.init_move_interval, jnp.int32),
            ramp_timer=jnp.asarray(params.ramp_interval, jnp.int32),
            ramp_index=jnp.asarray(0, jnp.int32),
            terminal=jnp.asarray(False),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state), state

    def step_env(self, key, state, action, params):
        k_slot, k_lr, k_gold = jax.random.split(key, 3)
        reward = jnp.asarray(0.0)

        # -- spawn --------------------------------------------------------
        do_spawn = state.spawn_timer == 0
        free = jnp.logical_not(state.e_exists)
        any_free = free.any()
        # pick a uniformly random free slot via gumbel-max over free mask
        gumbel = jax.random.uniform(k_slot, (8,), minval=1e-6, maxval=1.0)
        slot = jnp.argmax(jnp.where(free, gumbel, -1.0))
        spawn_now = jnp.logical_and(do_spawn, any_free)
        lr = jax.random.bernoulli(k_lr)
        gold = jax.random.bernoulli(k_gold, 1.0 / 3.0)
        e_exists = state.e_exists.at[slot].set(
            jnp.where(spawn_now, True, state.e_exists[slot])
        )
        e_x = state.e_x.at[slot].set(
            jnp.where(spawn_now, jnp.where(lr, 0, 9), state.e_x[slot])
        )
        e_lr = state.e_lr.at[slot].set(
            jnp.where(spawn_now, lr, state.e_lr[slot])
        )
        e_gold = state.e_gold.at[slot].set(
            jnp.where(spawn_now, gold, state.e_gold[slot])
        )
        spawn_timer = jnp.where(do_spawn, state.spawn_speed, state.spawn_timer - 1)

        # -- player move --------------------------------------------------
        px = jnp.clip(
            state.player_x
            + jnp.where(action == 1, -1, jnp.where(action == 3, 1, 0)),
            0,
            9,
        )
        py = jnp.clip(
            state.player_y
            + jnp.where(action == 2, -1, jnp.where(action == 4, 1, 0)),
            1,
            8,
        )

        rows = jnp.arange(1, 9)

        def collide(e_exists, e_x, e_gold, reward, terminal):
            hit = jnp.logical_and(
                e_exists, jnp.logical_and(e_x == px, rows == py)
            )
            reward = reward + jnp.where(jnp.logical_and(hit, e_gold), 1.0, 0.0).sum()
            terminal = jnp.logical_or(
                terminal,
                jnp.logical_and(hit, jnp.logical_not(e_gold)).any(),
            )
            e_exists = jnp.logical_and(e_exists, jnp.logical_not(hit))
            return e_exists, reward, terminal

        e_exists, reward, terminal = collide(
            e_exists, e_x, e_gold, reward, state.terminal
        )

        # -- entity move --------------------------------------------------
        do_move = state.move_timer == 0
        moved_x = e_x + jnp.where(e_lr, 1, -1)
        off = jnp.logical_or(moved_x < 0, moved_x > 9)
        e_x = jnp.where(jnp.logical_and(do_move, e_exists), moved_x, e_x)
        e_exists = jnp.logical_and(
            e_exists, jnp.logical_not(jnp.logical_and(do_move, off))
        )
        e_x = jnp.clip(e_x, 0, 9)
        move_timer = jnp.where(do_move, state.move_speed, state.move_timer - 1)

        e_exists, reward, terminal = collide(e_exists, e_x, e_gold, reward, terminal)

        # -- ramping ------------------------------------------------------
        can_ramp = jnp.logical_and(
            params.ramping,
            jnp.logical_or(state.spawn_speed > 1, state.move_speed > 1),
        )
        do_ramp = jnp.logical_and(can_ramp, state.ramp_timer <= 0)
        ramp_move = jnp.logical_and(
            do_ramp,
            jnp.logical_and(state.ramp_index % 2 == 1, state.move_speed > 1),
        )
        ramp_spawn = jnp.logical_and(
            do_ramp,
            jnp.logical_and(state.ramp_index % 2 == 0, state.spawn_speed > 1),
        )
        move_speed = jnp.where(ramp_move, state.move_speed - 1, state.move_speed)
        spawn_speed = jnp.where(ramp_spawn, state.spawn_speed - 1, state.spawn_speed)
        ramp_index = jnp.where(do_ramp, state.ramp_index + 1, state.ramp_index)
        ramp_timer = jnp.where(
            do_ramp, params.ramp_interval, state.ramp_timer - can_ramp
        )

        new_state = AsterixState(
            player_x=px,
            player_y=py,
            e_exists=e_exists,
            e_x=e_x,
            e_lr=e_lr,
            e_gold=e_gold,
            spawn_speed=spawn_speed,
            spawn_timer=spawn_timer,
            move_speed=move_speed,
            move_timer=move_timer,
            ramp_timer=ramp_timer,
            ramp_index=ramp_index,
            terminal=terminal,
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

    def get_obs(self, state: AsterixState) -> jax.Array:
        obs = jnp.zeros((10, 10, 4), dtype=jnp.float32)
        obs = obs.at[state.player_y, state.player_x, 0].set(1.0)
        rows = jnp.arange(1, 9)
        enemy = jnp.logical_and(state.e_exists, jnp.logical_not(state.e_gold))
        gold = jnp.logical_and(state.e_exists, state.e_gold)
        obs = obs.at[rows, state.e_x, 1].add(enemy.astype(jnp.float32))
        obs = obs.at[rows, state.e_x, 3].add(gold.astype(jnp.float32))
        trail_x = jnp.clip(state.e_x + jnp.where(state.e_lr, -1, 1), 0, 9)
        obs = obs.at[rows, trail_x, 2].add(state.e_exists.astype(jnp.float32))
        return jnp.minimum(obs, 1.0)

    def is_terminal(self, state, params):
        return jnp.logical_or(
            state.terminal, state.time >= params.max_steps_in_episode
        )

    def observation_space(self, params):
        return spaces.Box(0.0, 1.0, (10, 10, 4), jnp.float32)

    def action_space(self, params=None):
        return spaces.Discrete(5)
