"""Contact-rich 2-D manipulation tasks for the AC-PQN family — pure JAX.

The reference's manipulation block is mujoco_playground's suite
(/root/reference/scripts/train_playground_all.sh:117-163: PandaPickCube*,
AlohaSinglePegInsertion, LeapCubeRotate*/Reorient, PandaRobotiqPushCube).
Together with Pusher-v0 (pushing), these three cover the remaining task
archetypes of that family on compact branchless dynamics:

- PickPlace-v0   — Cartesian-controlled gripper grasps a block under
                   gravity and carries it to an elevated target
                   (PandaPickCubeCartesian archetype),
- PegInsert-v0   — a held peg must align with and descend into a narrow
                   slot; the table and slot walls push back (unilateral
                   contact clamps + a contact-force penalty)
                   (AlohaSinglePegInsertion archetype),
- BlockRotate-v0 — two opposed fingers rotate a block to a target angle
                   through a friction cone: torque transfer is capped by
                   the commanded squeeze force, excess commands slip
                   (LeapCubeRotateZAxis archetype).

All are branchless (where/clip contact resolution), 150-step episodes,
[-1, 1] action boxes — the playground protocol the AC engine consumes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


# --------------------------------------------------------------------------
# PickPlace
# --------------------------------------------------------------------------


@struct.dataclass
class PickPlaceState:
    grip: jax.Array       # (2,) gripper xz
    block: jax.Array      # (2,) block xz
    block_vel: jax.Array  # (2,)
    holding: jax.Array    # () float 0/1
    target: jax.Array     # (2,) xz (elevated)
    time: jax.Array


@struct.dataclass
class PickPlaceParams:
    dt: float = 0.05
    speed: float = 1.2          # gripper velocity gain
    gravity: float = 2.5
    grasp_radius: float = 0.08
    block_half: float = 0.03    # rest height
    target_radius: float = 0.08
    max_steps_in_episode: int = struct.field(pytree_node=False, default=150)


class PickPlace(Environment):
    """Pick a block off the floor and hold it at an elevated target."""

    @property
    def default_params(self) -> PickPlaceParams:
        return PickPlaceParams()

    @property
    def name(self) -> str:
        return "PickPlace-v0"

    def reset_env(self, key, params):
        k_b, k_t, k_g = jax.random.split(key, 3)
        bx = jax.random.uniform(k_b, (), minval=-0.7, maxval=0.7)
        block = jnp.array([bx, params.block_half])
        tx = jax.random.uniform(k_t, (), minval=-0.7, maxval=0.7)
        tz = jax.random.uniform(k_t, (), minval=0.35, maxval=0.8)
        gx = jax.random.uniform(k_g, (), minval=-0.7, maxval=0.7)
        state = PickPlaceState(
            grip=jnp.array([gx, 0.6]),
            block=block,
            block_vel=jnp.zeros(2),
            holding=jnp.asarray(0.0),
            target=jnp.array([tx, tz]),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    def step_env(self, key, state, action, params):
        a = jnp.clip(jnp.asarray(action).reshape(3), -1.0, 1.0)
        grip_vel = a[:2] * params.speed
        grip = state.grip + grip_vel * params.dt
        grip = jnp.clip(grip, jnp.array([-1.0, 0.0]), jnp.array([1.0, 1.0]))

        close = a[2] > 0.0
        release = a[2] < -0.5  # hysteresis: only a deliberate open drops
        near = (
            jnp.linalg.norm(state.block - grip) < params.grasp_radius
        )
        holding = jnp.where(
            release, 0.0, jnp.maximum(state.holding, (near & close) * 1.0)
        )

        # held block rides the gripper; free block falls to the floor
        fall_vel = state.block_vel + jnp.array([0.0, -params.gravity]) * params.dt
        free_block = state.block + fall_vel * params.dt
        on_floor = free_block[1] <= params.block_half
        free_block = free_block.at[1].set(
            jnp.maximum(free_block[1], params.block_half)
        )
        free_vel = jnp.where(
            on_floor, jnp.zeros(2), fall_vel
        )
        block = jnp.where(holding > 0.5, grip, free_block)
        block_vel = jnp.where(holding > 0.5, grip_vel, free_vel)

        reach_dist = jnp.linalg.norm(block - grip)
        place_dist = jnp.linalg.norm(block - state.target)
        in_target = place_dist < params.target_radius
        reward = (
            -0.5 * reach_dist * (1.0 - holding)
            + 0.25 * holding  # grasp-hold shaping (standard pick recipe)
            - place_dist
            + 1.0 * in_target
            - 0.01 * jnp.sum(a**2)
        )

        state = PickPlaceState(
            grip=grip,
            block=block,
            block_vel=block_vel,
            holding=holding,
            target=state.target,
            time=state.time + 1,
        )
        done = state.time >= params.max_steps_in_episode
        return (
            self.get_obs(state, params),
            state,
            reward,
            done,
            {"discount": 1.0 - done},
        )

    def get_obs(self, state, params):
        return jnp.concatenate(
            [
                state.grip,
                state.block,
                state.block_vel,
                state.holding[None],
                state.target,
                state.target - state.block,
            ]
        )

    def observation_space(self, params=None):
        return spaces.Box(-jnp.inf, jnp.inf, (11,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (3,), np.float32)


# --------------------------------------------------------------------------
# PegInsert
# --------------------------------------------------------------------------


@struct.dataclass
class PegInsertState:
    peg: jax.Array      # (2,) peg-tip xz
    vel: jax.Array      # (2,)
    slot_x: jax.Array   # ()
    time: jax.Array


@struct.dataclass
class PegInsertParams:
    dt: float = 0.05
    speed: float = 1.2
    table_z: float = 0.4        # table surface height
    slot_half: float = 0.035    # slot channel half-width
    peg_half: float = 0.02      # peg half-width
    slot_depth: float = 0.25
    max_steps_in_episode: int = struct.field(pytree_node=False, default=150)


class PegInsert(Environment):
    """Velocity-controlled peg into a narrow slot; table and slot walls
    are unilateral clamps whose blocked motion is penalized as contact
    force."""

    @property
    def default_params(self) -> PegInsertParams:
        return PegInsertParams()

    @property
    def name(self) -> str:
        return "PegInsert-v0"

    def reset_env(self, key, params):
        k_p, k_s = jax.random.split(key)
        px = jax.random.uniform(k_p, (), minval=-0.8, maxval=0.8)
        pz = jax.random.uniform(k_p, (), minval=params.table_z + 0.2, maxval=0.9)
        slot_x = jax.random.uniform(k_s, (), minval=-0.5, maxval=0.5)
        state = PegInsertState(
            peg=jnp.array([px, pz]),
            vel=jnp.zeros(2),
            slot_x=slot_x,
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    def step_env(self, key, state, action, params):
        a = jnp.clip(jnp.asarray(action).reshape(2), -1.0, 1.0)
        vel = a * params.speed
        want = state.peg + vel * params.dt

        clearance = params.slot_half - params.peg_half
        cur_inside = state.peg[1] < params.table_z - 1e-6
        # a peg already in the channel is laterally clamped by the walls
        x = jnp.where(
            cur_inside,
            jnp.clip(
                want[0], state.slot_x - clearance, state.slot_x + clearance
            ),
            want[0],
        )
        x = jnp.clip(x, -1.0, 1.0)
        # a peg above the surface can only descend past it when aligned
        # over the slot at its resolved x; the slot has a bottom
        aligned = jnp.abs(x - state.slot_x) < clearance
        z = jnp.where(
            (want[1] < params.table_z) & ~aligned & ~cur_inside,
            params.table_z,
            want[1],
        )
        z = jnp.maximum(z, params.table_z - params.slot_depth)
        zc = jnp.clip(z, 0.0, 1.0)
        peg = jnp.array([x, zc])
        # contact force = motion the constraints removed
        contact = jnp.linalg.norm(want - peg)

        entry = jnp.array([state.slot_x, params.table_z])
        approach = jnp.linalg.norm(peg - entry)
        depth = jnp.maximum(params.table_z - peg[1], 0.0)
        inserted = depth >= params.slot_depth - 1e-3
        reward = (
            -approach
            + 4.0 * depth
            + 2.0 * inserted
            - 1.0 * contact
            - 0.01 * jnp.sum(a**2)
        )

        state = PegInsertState(
            peg=peg,
            vel=vel,
            slot_x=state.slot_x,
            time=state.time + 1,
        )
        done = state.time >= params.max_steps_in_episode
        return (
            self.get_obs(state, params),
            state,
            reward,
            done,
            {"discount": 1.0 - done},
        )

    def get_obs(self, state, params):
        return jnp.array(
            [
                state.peg[0],
                state.peg[1],
                state.vel[0],
                state.vel[1],
                state.slot_x - state.peg[0],
                state.peg[1] - params.table_z,
                jnp.maximum(params.table_z - state.peg[1], 0.0),
                state.time / params.max_steps_in_episode,
            ]
        )

    def observation_space(self, params=None):
        return spaces.Box(-jnp.inf, jnp.inf, (8,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (2,), np.float32)


# --------------------------------------------------------------------------
# BlockRotate
# --------------------------------------------------------------------------


@struct.dataclass
class BlockRotateState:
    theta: jax.Array     # () block angle
    omega: jax.Array     # () angular velocity
    target: jax.Array    # () target angle
    time: jax.Array


@struct.dataclass
class BlockRotateParams:
    dt: float = 0.05
    friction_mu: float = 1.0     # friction cone: |tau| <= mu * squeeze
    torque_gain: float = 2.0
    damping: float = 0.3
    droop: float = 1.0           # gravity bias torque toward theta=0
    max_steps_in_episode: int = struct.field(pytree_node=False, default=150)


class BlockRotate(Environment):
    """Two opposed fingers rotate a block to a target angle. The commanded
    finger motion only transfers torque up to the friction cone set by the
    squeeze force — commanding more slips (capped torque), squeezing
    harder costs energy."""

    @property
    def default_params(self) -> BlockRotateParams:
        return BlockRotateParams()

    @property
    def name(self) -> str:
        return "BlockRotate-v0"

    def reset_env(self, key, params):
        k_t, k_g = jax.random.split(key)
        theta = jax.random.uniform(k_t, (), minval=-jnp.pi, maxval=jnp.pi)
        target = jax.random.uniform(k_g, (), minval=-jnp.pi, maxval=jnp.pi)
        state = BlockRotateState(
            theta=theta,
            omega=jnp.asarray(0.0),
            target=target,
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    @staticmethod
    def _angdiff(a, b):
        d = a - b
        return jnp.arctan2(jnp.sin(d), jnp.cos(d))

    def step_env(self, key, state, action, params):
        a = jnp.clip(jnp.asarray(action).reshape(3), -1.0, 1.0)
        squeeze = 0.5 * (a[2] + 1.0)  # [0, 1]
        commanded = (a[0] - a[1]) * 0.5 * params.torque_gain
        cone = params.friction_mu * squeeze
        tau = jnp.clip(commanded, -cone, cone)  # slip = the clipped excess
        slip = jnp.abs(commanded) - jnp.abs(tau)

        omega = state.omega + (
            tau
            - params.damping * state.omega
            - params.droop * jnp.sin(state.theta)
        ) * params.dt
        theta_raw = state.theta + omega * params.dt
        theta = jnp.arctan2(jnp.sin(theta_raw), jnp.cos(theta_raw))

        err = jnp.abs(self._angdiff(theta, state.target))
        settled = (err < 0.1) & (jnp.abs(omega) < 0.5)
        reward = (
            -err
            + 1.0 * settled
            - 0.05 * squeeze
            - 0.02 * slip
            - 0.01 * (a[0] ** 2 + a[1] ** 2)
        )

        state = BlockRotateState(
            theta=theta,
            omega=omega,
            target=state.target,
            time=state.time + 1,
        )
        done = state.time >= params.max_steps_in_episode
        return (
            self.get_obs(state, params),
            state,
            reward,
            done,
            {"discount": 1.0 - done},
        )

    def get_obs(self, state, params):
        return jnp.array(
            [
                jnp.cos(state.theta),
                jnp.sin(state.theta),
                state.omega,
                jnp.cos(state.target),
                jnp.sin(state.target),
                self._angdiff(state.theta, state.target),
            ]
        )

    def observation_space(self, params=None):
        return spaces.Box(-jnp.inf, jnp.inf, (6,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (3,), np.float32)
