"""Seaquest-MinAtar in pure JAX — the fifth (and most complex) MinAtar game.

MinAtar Seaquest semantics (arXiv 1903.03176): a submarine shoots enemy
fish and subs (+1 each), rescues divers, and must surface to refill a
depleting oxygen tank — but surfacing with no diver on board is fatal, and
surfacing with a full complement of six cashes them in for bonus reward.
Enemy subs return fire; difficulty ramps as enemies speed up.

Entities live in fixed slots (one lane-agnostic pool per kind) with
per-slot (exists, x, y, direction, timer) arrays — static shapes,
branchless, vmappable. 10 observation channels
[sub_front, sub_back, friendly_bullet, trail, enemy_sub, enemy_bullet,
 enemy_fish, diver, oxygen_gauge, diver_gauge]; 6 actions
[noop, left, up, right, down, fire].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment

N_FISH = 8
N_SUBS = 4
N_EBULLETS = 4
N_FBULLETS = 4
N_DIVERS = 4


@struct.dataclass
class SeaquestState:
    sub_x: jax.Array
    sub_y: jax.Array
    sub_or: jax.Array        # facing: 0 left, 1 right
    oxygen: jax.Array
    divers: jax.Array        # divers on board (0..6)
    shot_timer: jax.Array
    # enemy fish: swim straight across
    f_exists: jax.Array
    f_x: jax.Array
    f_y: jax.Array
    f_dir: jax.Array         # +1 right, -1 left
    f_timer: jax.Array
    # enemy subs: swim + shoot
    s_exists: jax.Array
    s_x: jax.Array
    s_y: jax.Array
    s_dir: jax.Array
    s_timer: jax.Array
    s_shot_timer: jax.Array
    # bullets
    fb_exists: jax.Array     # friendly
    fb_x: jax.Array
    fb_y: jax.Array
    fb_dir: jax.Array
    eb_exists: jax.Array     # enemy
    eb_x: jax.Array
    eb_y: jax.Array
    eb_dir: jax.Array
    # divers in the water
    d_exists: jax.Array
    d_x: jax.Array
    d_y: jax.Array
    d_dir: jax.Array
    d_timer: jax.Array
    spawn_timer: jax.Array
    diver_spawn_timer: jax.Array
    move_interval: jax.Array  # enemy move cadence (ramps down)
    surfaced: jax.Array
    terminal: jax.Array
    time: jax.Array


@struct.dataclass
class SeaquestParams:
    max_oxygen: int = struct.field(pytree_node=False, default=200)
    init_spawn_speed: int = struct.field(pytree_node=False, default=20)
    diver_spawn_speed: int = struct.field(pytree_node=False, default=30)
    init_move_interval: int = struct.field(pytree_node=False, default=5)
    shot_cool_down: int = struct.field(pytree_node=False, default=5)
    enemy_shot_interval: int = struct.field(pytree_node=False, default=10)
    max_steps_in_episode: int = struct.field(pytree_node=False, default=1000)


def _move_lane_entities(exists, x, y, direction, timer, interval):
    """Advance lane entities on their cadence; despawn off-grid."""
    do_move = timer <= 0
    nx = x + jnp.where(do_move & exists, direction, 0)
    off = (nx < 0) | (nx > 9)
    exists = exists & ~(do_move & off)
    nx = jnp.clip(nx, 0, 9)
    timer = jnp.where(do_move, interval, timer - 1)
    return exists, nx, y, timer


def _spawn_slot(key, free_mask):
    """Uniformly pick one free slot (gumbel-max over the mask)."""
    gumbel = jax.random.uniform(key, free_mask.shape, minval=1e-6, maxval=1.0)
    return jnp.argmax(jnp.where(free_mask, gumbel, -1.0)), free_mask.any()


class MinSeaquest(Environment):
    @property
    def default_params(self) -> SeaquestParams:
        return SeaquestParams()

    @property
    def name(self) -> str:
        return "Seaquest-MinAtar"

    def reset_env(self, key, params):
        z8 = jnp.zeros(N_FISH, jnp.int32)
        state = SeaquestState(
            sub_x=jnp.asarray(5, jnp.int32),
            sub_y=jnp.asarray(0, jnp.int32),
            sub_or=jnp.asarray(1, jnp.int32),
            oxygen=jnp.asarray(params.max_oxygen, jnp.int32),
            divers=jnp.asarray(0, jnp.int32),
            shot_timer=jnp.asarray(0, jnp.int32),
            f_exists=jnp.zeros(N_FISH, bool), f_x=z8, f_y=z8,
            f_dir=jnp.ones(N_FISH, jnp.int32), f_timer=z8,
            s_exists=jnp.zeros(N_SUBS, bool),
            s_x=jnp.zeros(N_SUBS, jnp.int32), s_y=jnp.zeros(N_SUBS, jnp.int32),
            s_dir=jnp.ones(N_SUBS, jnp.int32),
            s_timer=jnp.zeros(N_SUBS, jnp.int32),
            s_shot_timer=jnp.full(N_SUBS, params.enemy_shot_interval, jnp.int32),
            fb_exists=jnp.zeros(N_FBULLETS, bool),
            fb_x=jnp.zeros(N_FBULLETS, jnp.int32),
            fb_y=jnp.zeros(N_FBULLETS, jnp.int32),
            fb_dir=jnp.ones(N_FBULLETS, jnp.int32),
            eb_exists=jnp.zeros(N_EBULLETS, bool),
            eb_x=jnp.zeros(N_EBULLETS, jnp.int32),
            eb_y=jnp.zeros(N_EBULLETS, jnp.int32),
            eb_dir=jnp.ones(N_EBULLETS, jnp.int32),
            d_exists=jnp.zeros(N_DIVERS, bool),
            d_x=jnp.zeros(N_DIVERS, jnp.int32),
            d_y=jnp.zeros(N_DIVERS, jnp.int32),
            d_dir=jnp.ones(N_DIVERS, jnp.int32),
            d_timer=jnp.zeros(N_DIVERS, jnp.int32),
            spawn_timer=jnp.asarray(params.init_spawn_speed, jnp.int32),
            diver_spawn_timer=jnp.asarray(params.diver_spawn_speed, jnp.int32),
            move_interval=jnp.asarray(params.init_move_interval, jnp.int32),
            surfaced=jnp.asarray(True),
            terminal=jnp.asarray(False),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state), state

    # ------------------------------------------------------------------
    def step_env(self, key, state, action, params):
        ks = jax.random.split(key, 6)
        reward = jnp.asarray(0.0)

        # -- player -----------------------------------------------------
        sub_x = jnp.clip(
            state.sub_x
            + jnp.where(action == 1, -1, jnp.where(action == 3, 1, 0)),
            0, 9,
        )
        sub_y = jnp.clip(
            state.sub_y
            + jnp.where(action == 2, -1, jnp.where(action == 4, 1, 0)),
            0, 8,
        )
        sub_or = jnp.where(
            action == 1, 0, jnp.where(action == 3, 1, state.sub_or)
        )

        # fire: one friendly bullet from the sub's nose
        fire = (action == 5) & (state.shot_timer == 0)
        fb_slot, fb_free = _spawn_slot(ks[0], ~state.fb_exists)
        do_fire = fire & fb_free
        fb_exists = state.fb_exists.at[fb_slot].set(
            jnp.where(do_fire, True, state.fb_exists[fb_slot])
        )
        fb_x = state.fb_x.at[fb_slot].set(
            jnp.where(do_fire, sub_x, state.fb_x[fb_slot])
        )
        fb_y = state.fb_y.at[fb_slot].set(
            jnp.where(do_fire, sub_y, state.fb_y[fb_slot])
        )
        fb_dir = state.fb_dir.at[fb_slot].set(
            jnp.where(do_fire, jnp.where(sub_or == 1, 1, -1), state.fb_dir[fb_slot])
        )
        shot_timer = jnp.where(
            do_fire, params.shot_cool_down, jnp.maximum(state.shot_timer - 1, 0)
        )

        # -- bullets move every step -------------------------------------
        fb_x = jnp.where(fb_exists, fb_x + fb_dir, fb_x)
        fb_exists = fb_exists & (fb_x >= 0) & (fb_x <= 9)
        fb_x = jnp.clip(fb_x, 0, 9)
        eb_x = jnp.where(state.eb_exists, state.eb_x + state.eb_dir, state.eb_x)
        eb_exists = state.eb_exists & (eb_x >= 0) & (eb_x <= 9)
        eb_x = jnp.clip(eb_x, 0, 9)
        eb_y = state.eb_y
        eb_dir = state.eb_dir

        # -- enemies move on cadence -------------------------------------
        f_exists, f_x, f_y, f_timer = _move_lane_entities(
            state.f_exists, state.f_x, state.f_y, state.f_dir,
            state.f_timer, state.move_interval,
        )
        s_exists, s_x, s_y, s_timer = _move_lane_entities(
            state.s_exists, state.s_x, state.s_y, state.s_dir,
            state.s_timer, state.move_interval,
        )
        d_exists, d_x, d_y, d_timer = _move_lane_entities(
            state.d_exists, state.d_x, state.d_y, state.d_dir,
            state.d_timer, state.move_interval * 2,
        )

        # -- enemy subs shoot --------------------------------------------
        s_shot_timer = state.s_shot_timer - s_exists.astype(jnp.int32)
        wants_shot = s_exists & (s_shot_timer <= 0)
        # one sub shoots per step (first eligible), into a free bullet slot
        shooter = jnp.argmax(wants_shot)
        can_shoot = wants_shot.any()
        eb_slot, eb_free = _spawn_slot(ks[1], ~eb_exists)
        do_eshot = can_shoot & eb_free
        eb_exists = eb_exists.at[eb_slot].set(
            jnp.where(do_eshot, True, eb_exists[eb_slot])
        )
        eb_x = eb_x.at[eb_slot].set(jnp.where(do_eshot, s_x[shooter], eb_x[eb_slot]))
        eb_y = eb_y.at[eb_slot].set(jnp.where(do_eshot, s_y[shooter], eb_y[eb_slot]))
        eb_dir = eb_dir.at[eb_slot].set(
            jnp.where(do_eshot, state.s_dir[shooter], eb_dir[eb_slot])
        )
        s_shot_timer = jnp.where(
            wants_shot & (jnp.arange(N_SUBS) == shooter) & do_eshot,
            params.enemy_shot_interval,
            s_shot_timer,
        )

        # -- friendly bullets hit enemies --------------------------------
        def hits(bx, bexists, ex, ey, eexists):
            return (
                bexists[:, None] & eexists[None, :]
                & (bx[:, None] == ex[None, :])
            )

        fh = hits(fb_x, fb_exists, f_x, f_y, f_exists) & (
            fb_y[:, None] == f_y[None, :]
        )
        sh = hits(fb_x, fb_exists, s_x, s_y, s_exists) & (
            fb_y[:, None] == s_y[None, :]
        )
        reward = reward + fh.any(axis=0).sum() + sh.any(axis=0).sum()
        f_exists = f_exists & ~fh.any(axis=0)
        s_exists = s_exists & ~sh.any(axis=0)
        fb_exists = fb_exists & ~(fh.any(axis=1) | sh.any(axis=1))

        # -- spawning ----------------------------------------------------
        spawn_timer = state.spawn_timer - 1
        do_spawn = spawn_timer <= 0
        lane = jax.random.randint(ks[2], (), 1, 9)
        lr = jax.random.bernoulli(ks[3])
        is_sub = jax.random.bernoulli(ks[4], 1.0 / 3.0)
        fslot, f_free = _spawn_slot(ks[5], ~f_exists)
        sslot, s_free = _spawn_slot(ks[5], ~s_exists)
        spawn_fish = do_spawn & ~is_sub & f_free
        spawn_sub = do_spawn & is_sub & s_free
        f_exists = f_exists.at[fslot].set(spawn_fish | f_exists[fslot])
        f_x = f_x.at[fslot].set(
            jnp.where(spawn_fish, jnp.where(lr, 0, 9), f_x[fslot])
        )
        f_y = f_y.at[fslot].set(jnp.where(spawn_fish, lane, f_y[fslot]))
        f_dir = state.f_dir.at[fslot].set(
            jnp.where(spawn_fish, jnp.where(lr, 1, -1), state.f_dir[fslot])
        )
        s_exists = s_exists.at[sslot].set(spawn_sub | s_exists[sslot])
        s_x = s_x.at[sslot].set(
            jnp.where(spawn_sub, jnp.where(lr, 0, 9), s_x[sslot])
        )
        s_y = s_y.at[sslot].set(jnp.where(spawn_sub, lane, s_y[sslot]))
        s_dir = state.s_dir.at[sslot].set(
            jnp.where(spawn_sub, jnp.where(lr, 1, -1), state.s_dir[sslot])
        )
        spawn_timer = jnp.where(do_spawn, params.init_spawn_speed, spawn_timer)

        diver_spawn_timer = state.diver_spawn_timer - 1
        do_dspawn = diver_spawn_timer <= 0
        dslot, d_free = _spawn_slot(ks[2], ~d_exists)
        spawn_diver = do_dspawn & d_free
        d_exists = d_exists.at[dslot].set(spawn_diver | d_exists[dslot])
        d_x = d_x.at[dslot].set(
            jnp.where(spawn_diver, jnp.where(lr, 0, 9), d_x[dslot])
        )
        d_y = d_y.at[dslot].set(jnp.where(spawn_diver, lane, d_y[dslot]))
        d_dir = state.d_dir.at[dslot].set(
            jnp.where(spawn_diver, jnp.where(lr, 1, -1), state.d_dir[dslot])
        )
        diver_spawn_timer = jnp.where(
            do_dspawn, params.diver_spawn_speed, diver_spawn_timer
        )

        # -- collisions with the player ----------------------------------
        divers = state.divers
        pick = d_exists & (d_x == sub_x) & (d_y == sub_y)
        divers = jnp.minimum(divers + pick.sum(), 6)
        d_exists = d_exists & ~pick

        hit_enemy = (
            (f_exists & (f_x == sub_x) & (f_y == sub_y)).any()
            | (s_exists & (s_x == sub_x) & (s_y == sub_y)).any()
            | (eb_exists & (eb_x == sub_x) & (eb_y == sub_y)).any()
        )

        # -- oxygen / surfacing ------------------------------------------
        underwater = sub_y > 0
        oxygen = jnp.where(underwater, state.oxygen - 1, state.oxygen)
        now_surfacing = (~underwater) & (~state.surfaced)
        # surfacing with no divers is fatal; with 6 divers cash-in bonus
        fatal_surface = now_surfacing & (divers == 0)
        cash_in = now_surfacing & (divers == 6)
        reward = reward + jnp.where(
            cash_in, oxygen.astype(jnp.float32) / 10.0, 0.0
        )
        divers = jnp.where(now_surfacing & ~fatal_surface,
                           jnp.where(cash_in, 0, divers - 1), divers)
        oxygen = jnp.where(
            now_surfacing & ~fatal_surface, params.max_oxygen, oxygen
        )
        surfaced = ~underwater

        terminal = (
            state.terminal | hit_enemy | fatal_surface | (oxygen < 0)
        )

        new_state = SeaquestState(
            sub_x=sub_x, sub_y=sub_y, sub_or=sub_or,
            oxygen=oxygen, divers=divers, shot_timer=shot_timer,
            f_exists=f_exists, f_x=f_x, f_y=f_y, f_dir=f_dir, f_timer=f_timer,
            s_exists=s_exists, s_x=s_x, s_y=s_y, s_dir=s_dir,
            s_timer=s_timer, s_shot_timer=s_shot_timer,
            fb_exists=fb_exists, fb_x=fb_x, fb_y=fb_y, fb_dir=fb_dir,
            eb_exists=eb_exists, eb_x=eb_x, eb_y=eb_y, eb_dir=eb_dir,
            d_exists=d_exists, d_x=d_x, d_y=d_y, d_dir=d_dir, d_timer=d_timer,
            spawn_timer=spawn_timer, diver_spawn_timer=diver_spawn_timer,
            move_interval=state.move_interval,
            surfaced=surfaced, terminal=terminal, time=state.time + 1,
        )
        done = self.is_terminal(new_state, params)
        return (
            jax.lax.stop_gradient(self.get_obs(new_state, params)),
            jax.lax.stop_gradient(new_state),
            reward.astype(jnp.float32),
            done,
            {},
        )

    # ------------------------------------------------------------------
    def get_obs(self, state: SeaquestState, params=None) -> jax.Array:
        params = params or self.default_params
        obs = jnp.zeros((10, 10, 10), jnp.float32)
        # player occupies (y+1 row on grid? MinAtar offsets by 0) — front
        # cell in the facing direction, back cell behind
        obs = obs.at[state.sub_y, state.sub_x, 0].set(1.0)
        back_x = jnp.clip(
            state.sub_x + jnp.where(state.sub_or == 1, -1, 1), 0, 9
        )
        obs = obs.at[state.sub_y, back_x, 1].set(1.0)

        def put(obs, exists, x, y, c):
            return obs.at[y, x, c].add(exists.astype(jnp.float32))

        obs = put(obs, state.fb_exists, state.fb_x, state.fb_y, 2)
        # trail channel: behind friendly bullets
        tr_x = jnp.clip(state.fb_x - state.fb_dir, 0, 9)
        obs = put(obs, state.fb_exists, tr_x, state.fb_y, 3)
        obs = put(obs, state.s_exists, state.s_x, state.s_y, 4)
        obs = put(obs, state.eb_exists, state.eb_x, state.eb_y, 5)
        obs = put(obs, state.f_exists, state.f_x, state.f_y, 6)
        obs = put(obs, state.d_exists, state.d_x, state.d_y, 7)
        # gauges on the bottom row
        oxy_cells = jnp.clip(
            (state.oxygen * 10) // params.max_oxygen, 0, 9
        )
        cols = jnp.arange(10)
        obs = obs.at[9, :, 8].set((cols < oxy_cells).astype(jnp.float32))
        obs = obs.at[9, :, 9].set((cols < state.divers).astype(jnp.float32))
        return jnp.minimum(obs, 1.0)

    def is_terminal(self, state, params):
        return jnp.logical_or(
            state.terminal, state.time >= params.max_steps_in_episode
        )

    def observation_space(self, params):
        return spaces.Box(0.0, 1.0, (10, 10, 10), jnp.float32)

    def action_space(self, params=None):
        return spaces.Discrete(6)
