"""SpaceInvaders-MinAtar in pure JAX.

MinAtar SpaceInvaders semantics: a cannon on the bottom row fires (with
cooldown) at a marching 4x6 alien grid; aliens drop a row at the walls and
shoot back from the column nearest the player. Clearing the wave respawns
it with a faster march. 6 obs channels [cannon, alien, alien_left,
alien_right, friendly_bullet, enemy_bullet]; minimal 4-action set
[noop, left, right, fire].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class SpaceInvadersState:
    pos: jax.Array
    f_bullet_map: jax.Array  # (10, 10)
    e_bullet_map: jax.Array  # (10, 10)
    alien_map: jax.Array  # (10, 10)
    alien_dir: jax.Array
    enemy_move_interval: jax.Array
    alien_move_timer: jax.Array
    alien_shot_timer: jax.Array
    ramp_index: jax.Array
    shot_timer: jax.Array
    terminal: jax.Array
    time: jax.Array


@struct.dataclass
class SpaceInvadersParams:
    shot_cool_down: int = struct.field(pytree_node=False, default=5)
    enemy_move_interval: int = struct.field(pytree_node=False, default=12)
    enemy_shot_interval: int = struct.field(pytree_node=False, default=10)
    ramping: bool = struct.field(pytree_node=False, default=True)
    max_steps_in_episode: int = struct.field(pytree_node=False, default=1000)


class MinSpaceInvaders(Environment):
    @property
    def default_params(self) -> SpaceInvadersParams:
        return SpaceInvadersParams()

    @property
    def name(self) -> str:
        return "SpaceInvaders-MinAtar"

    def reset_env(self, key, params):
        alien_map = jnp.zeros((10, 10), jnp.int32).at[0:4, 2:8].set(1)
        state = SpaceInvadersState(
            pos=jnp.asarray(5, jnp.int32),
            f_bullet_map=jnp.zeros((10, 10), jnp.int32),
            e_bullet_map=jnp.zeros((10, 10), jnp.int32),
            alien_map=alien_map,
            alien_dir=jnp.asarray(-1, jnp.int32),
            enemy_move_interval=jnp.asarray(params.enemy_move_interval, jnp.int32),
            alien_move_timer=jnp.asarray(params.enemy_move_interval, jnp.int32),
            alien_shot_timer=jnp.asarray(params.enemy_shot_interval, jnp.int32),
            ramp_index=jnp.asarray(0, jnp.int32),
            shot_timer=jnp.asarray(0, jnp.int32),
            terminal=jnp.asarray(False),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state), state

    def step_env(self, key, state, action, params):
        # actions: 0 noop, 1 left, 2 right, 3 fire
        fire = jnp.logical_and(action == 3, state.shot_timer == 0)
        pos = jnp.clip(
            state.pos + jnp.where(action == 1, -1, jnp.where(action == 2, 1, 0)),
            0,
            9,
        )
        f_bullet_map = jnp.where(
            fire, state.f_bullet_map.at[9, pos].set(1), state.f_bullet_map
        )
        shot_timer = jnp.where(
            fire, params.shot_cool_down, jnp.maximum(state.shot_timer - 1, 0)
        )

        # bullets travel
        f_bullet_map = jnp.roll(f_bullet_map, -1, axis=0).at[9, :].set(0)
        e_bullet_map = jnp.roll(state.e_bullet_map, 1, axis=0).at[0, :].set(0)
        terminal = jnp.logical_or(state.terminal, e_bullet_map[9, pos] == 1)

        # alien march
        alien_map = state.alien_map
        alien_dir = state.alien_dir
        do_move = state.alien_move_timer == 0
        at_edge = jnp.logical_or(
            jnp.logical_and(alien_map[:, 0].sum() > 0, alien_dir < 0),
            jnp.logical_and(alien_map[:, 9].sum() > 0, alien_dir > 0),
        )
        drop = jnp.logical_and(do_move, at_edge)
        shift = jnp.logical_and(do_move, jnp.logical_not(at_edge))
        terminal = jnp.logical_or(
            terminal, jnp.logical_and(drop, alien_map[9, :].sum() > 0)
        )
        alien_dir = jnp.where(drop, -alien_dir, alien_dir)
        alien_map = jnp.where(drop, jnp.roll(alien_map, 1, axis=0), alien_map)
        alien_map = jnp.where(
            shift,
            jnp.where(
                state.alien_dir < 0,
                jnp.roll(alien_map, -1, axis=1),
                jnp.roll(alien_map, 1, axis=1),
            ),
            alien_map,
        )
        alien_move_timer = jnp.where(
            do_move,
            jnp.minimum(alien_map.sum(), state.enemy_move_interval),
            state.alien_move_timer - 1,
        )
        terminal = jnp.logical_or(terminal, alien_map[9, pos] == 1)

        # alien shoots from the column nearest the cannon (lowest alien)
        do_shoot = state.alien_shot_timer == 0
        cols = jnp.arange(10)
        col_has = alien_map.sum(axis=0) > 0
        col_dist = jnp.where(col_has, jnp.abs(cols - pos), 100)
        shoot_col = jnp.argmin(col_dist)
        rows = jnp.arange(10)
        col_aliens = alien_map[:, shoot_col]
        shoot_row = jnp.max(jnp.where(col_aliens > 0, rows, -1))
        can_shoot = jnp.logical_and(do_shoot, col_has.any())
        e_bullet_map = jnp.where(
            can_shoot,
            e_bullet_map.at[jnp.maximum(shoot_row, 0), shoot_col].set(1),
            e_bullet_map,
        )
        alien_shot_timer = jnp.where(
            do_shoot, params.enemy_shot_interval, state.alien_shot_timer - 1
        )

        # kills
        kill = jnp.logical_and(alien_map == 1, f_bullet_map == 1)
        reward = kill.sum().astype(jnp.float32)
        alien_map = alien_map * (1 - kill)
        f_bullet_map = f_bullet_map * (1 - kill)

        # wave cleared -> respawn, ramp the march speed
        cleared = alien_map.sum() == 0
        alien_map = jnp.where(
            cleared, alien_map.at[0:4, 2:8].set(1), alien_map
        )
        enemy_move_interval = jnp.where(
            jnp.logical_and(
                cleared,
                jnp.logical_and(params.ramping, state.enemy_move_interval > 6),
            ),
            state.enemy_move_interval - 1,
            state.enemy_move_interval,
        )
        ramp_index = jnp.where(cleared, state.ramp_index + 1, state.ramp_index)

        new_state = SpaceInvadersState(
            pos=pos,
            f_bullet_map=f_bullet_map,
            e_bullet_map=e_bullet_map,
            alien_map=alien_map,
            alien_dir=alien_dir,
            enemy_move_interval=enemy_move_interval,
            alien_move_timer=alien_move_timer,
            alien_shot_timer=alien_shot_timer,
            ramp_index=ramp_index,
            shot_timer=shot_timer,
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

    def get_obs(self, state: SpaceInvadersState) -> jax.Array:
        obs = jnp.zeros((10, 10, 6), dtype=jnp.float32)
        obs = obs.at[9, state.pos, 0].set(1.0)
        alien = state.alien_map.astype(jnp.float32)
        obs = obs.at[:, :, 1].set(alien)
        obs = obs.at[:, :, 2].set(jnp.where(state.alien_dir < 0, alien, 0.0))
        obs = obs.at[:, :, 3].set(jnp.where(state.alien_dir > 0, alien, 0.0))
        obs = obs.at[:, :, 4].set(state.f_bullet_map.astype(jnp.float32))
        obs = obs.at[:, :, 5].set(state.e_bullet_map.astype(jnp.float32))
        return obs

    def is_terminal(self, state, params):
        return jnp.logical_or(
            state.terminal, state.time >= params.max_steps_in_episode
        )

    def observation_space(self, params):
        return spaces.Box(0.0, 1.0, (10, 10, 6), jnp.float32)

    def action_space(self, params=None):
        return spaces.Discrete(4)
