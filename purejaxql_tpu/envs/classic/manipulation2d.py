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
    """Pick a block off the floor and hold it at an elevated target.
    Velocity (cartesian) control — the reference's PandaPickCubeCartesian
    archetype; PandaPickCube is the second-order variant below."""

    def __init__(self, name: str | None = None):
        self._name = name

    @property
    def default_params(self) -> PickPlaceParams:
        return PickPlaceParams()

    @property
    def name(self) -> str:
        return self._name or "PickPlace-v0"

    def reset_env(self, key, params):
        # one key per independent draw: reusing a key makes the two
        # uniforms perfectly correlated (targets collapse onto a line)
        k_b, k_tx, k_tz, k_g = jax.random.split(key, 4)
        bx = jax.random.uniform(k_b, (), minval=-0.7, maxval=0.7)
        block = jnp.array([bx, params.block_half])
        tx = jax.random.uniform(k_tx, (), minval=-0.7, maxval=0.7)
        tz = jax.random.uniform(k_tz, (), minval=0.35, maxval=0.8)
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
    force (the reference's AlohaSinglePegInsertion archetype)."""

    def __init__(self, name: str | None = None):
        self._name = name

    @property
    def default_params(self) -> PegInsertParams:
        return PegInsertParams()

    @property
    def name(self) -> str:
        return self._name or "PegInsert-v0"

    def reset_env(self, key, params):
        k_px, k_pz, k_s = jax.random.split(key, 3)
        px = jax.random.uniform(k_px, (), minval=-0.8, maxval=0.8)
        pz = jax.random.uniform(k_pz, (), minval=params.table_z + 0.2, maxval=0.9)
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
    """Two opposed fingers rotate a block through a friction cone set by
    the squeeze force — commanding more torque than the cone transmits
    slips (capped), squeezing harder costs energy.

    Tasks (the reference's two Leap-hand cube rows,
    train_playground_all.sh:121-122):
    - "reorient" (LeapCubeReorient / BlockRotate-v0): bring the block to
      a sampled target angle and hold it there.
    - "spin" (LeapCubeRotateZAxis): keep the block rotating in the
      positive direction — sustained angular velocity through the cone,
      against droop and damping; no target in state or obs."""

    TASKS = ("reorient", "spin")

    def __init__(self, task: str = "reorient", name: str | None = None):
        assert task in self.TASKS, task
        self.task = task
        self._name = name

    @property
    def default_params(self) -> BlockRotateParams:
        return BlockRotateParams()

    @property
    def name(self) -> str:
        return self._name or (
            "BlockRotate-v0" if self.task == "reorient" else "LeapCubeRotateZAxis"
        )

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

        if self.task == "spin":
            # sustained positive rotation, saturating at 3 rad/s
            reward = (
                jnp.clip(omega / 3.0, -1.0, 1.0)
                - 0.05 * squeeze
                - 0.02 * slip
                - 0.01 * (a[0] ** 2 + a[1] ** 2)
            )
        else:
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
        if self.task == "spin":
            return jnp.array(
                [jnp.cos(state.theta), jnp.sin(state.theta), state.omega]
            )
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
        return spaces.Box(
            -jnp.inf, jnp.inf, (3 if self.task == "spin" else 6,), np.float32
        )

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (3,), np.float32)


# --------------------------------------------------------------------------
# PandaPickCube / PandaPickCubeOrientation — second-order (force) control
# --------------------------------------------------------------------------


@struct.dataclass
class PandaPickState:
    grip: jax.Array       # (2,) gripper xz
    grip_vel: jax.Array   # (2,)
    block: jax.Array      # (2,) block xz
    block_vel: jax.Array  # (2,)
    yaw: jax.Array        # () block yaw (orientation variant; 0 otherwise)
    target_yaw: jax.Array
    holding: jax.Array
    target: jax.Array     # (2,)
    time: jax.Array


@struct.dataclass
class PandaPickParams:
    dt: float = 0.05
    accel: float = 4.0          # commanded acceleration gain
    vel_damp: float = 2.0       # arm joint damping
    wrist_rate: float = 2.5     # wrist yaw rate (orientation variant)
    gravity: float = 2.5
    grasp_radius: float = 0.08
    block_half: float = 0.03
    target_radius: float = 0.08
    yaw_tol: float = 0.25
    max_steps_in_episode: int = struct.field(pytree_node=False, default=150)


class PandaPickCube(Environment):
    """Second-order pick-and-place: the action commands gripper
    ACCELERATION (the joint-torque control of the reference's
    PandaPickCube, vs PandaPickCubeCartesian's velocity control =
    PickPlace here), so momentum matters — overshooting the grasp or the
    target is possible and the policy must brake. The `orientation`
    variant (PandaPickCubeOrientation) adds a block yaw DOF driven by a
    wrist channel while held, with a yaw-alignment term in the reward.
    Reference rows: train_playground_all.sh:146-163.
    """

    orientation: bool = False

    def __init__(self, orientation: bool = False, name: str | None = None):
        self.orientation = orientation
        self._name = name

    @property
    def default_params(self) -> PandaPickParams:
        return PandaPickParams()

    @property
    def name(self) -> str:
        return self._name or (
            "PandaPickCubeOrientation" if self.orientation else "PandaPickCube"
        )

    def reset_env(self, key, params):
        k_b, k_tx, k_tz, k_g, k_y = jax.random.split(key, 5)
        bx = jax.random.uniform(k_b, (), minval=-0.7, maxval=0.7)
        tx = jax.random.uniform(k_tx, (), minval=-0.7, maxval=0.7)
        tz = jax.random.uniform(k_tz, (), minval=0.35, maxval=0.8)
        gx = jax.random.uniform(k_g, (), minval=-0.7, maxval=0.7)
        tyaw = jnp.where(
            self.orientation,
            jax.random.uniform(k_y, (), minval=-jnp.pi, maxval=jnp.pi),
            0.0,
        )
        state = PandaPickState(
            grip=jnp.array([gx, 0.6]),
            grip_vel=jnp.zeros(2),
            block=jnp.array([bx, params.block_half]),
            block_vel=jnp.zeros(2),
            yaw=jnp.asarray(0.0),
            target_yaw=jnp.asarray(tyaw),
            holding=jnp.asarray(0.0),
            target=jnp.array([tx, tz]),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    def step_env(self, key, state, action, params):
        n_act = 4 if self.orientation else 3
        a = jnp.clip(jnp.asarray(action).reshape(n_act), -1.0, 1.0)
        wrist = a[2] if self.orientation else jnp.asarray(0.0)
        grip_cmd = a[n_act - 1]

        # second-order arm: commanded acceleration against viscous damping
        grip_vel = (
            state.grip_vel
            + (a[:2] * params.accel - params.vel_damp * state.grip_vel)
            * params.dt
        )
        grip = state.grip + grip_vel * params.dt
        lo, hi = jnp.array([-1.0, 0.0]), jnp.array([1.0, 1.0])
        hit = (grip < lo) | (grip > hi)
        grip = jnp.clip(grip, lo, hi)
        grip_vel = jnp.where(hit, 0.0, grip_vel)  # walls absorb momentum

        close = grip_cmd > 0.0
        release = grip_cmd < -0.5
        near = jnp.linalg.norm(state.block - grip) < params.grasp_radius
        holding = jnp.where(
            release, 0.0, jnp.maximum(state.holding, (near & close) * 1.0)
        )

        fall_vel = state.block_vel + jnp.array([0.0, -params.gravity]) * params.dt
        free_block = state.block + fall_vel * params.dt
        on_floor = free_block[1] <= params.block_half
        free_block = free_block.at[1].set(
            jnp.maximum(free_block[1], params.block_half)
        )
        free_vel = jnp.where(on_floor, jnp.zeros(2), fall_vel)
        block = jnp.where(holding > 0.5, grip, free_block)
        block_vel = jnp.where(holding > 0.5, grip_vel, free_vel)

        # wrist drives block yaw only while held (the hand carries the cube)
        yaw_raw = state.yaw + wrist * params.wrist_rate * params.dt * holding
        yaw = jnp.arctan2(jnp.sin(yaw_raw), jnp.cos(yaw_raw))

        reach_dist = jnp.linalg.norm(block - grip)
        place_dist = jnp.linalg.norm(block - state.target)
        yaw_err = jnp.abs(
            jnp.arctan2(
                jnp.sin(yaw - state.target_yaw), jnp.cos(yaw - state.target_yaw)
            )
        )
        in_target = place_dist < params.target_radius
        if self.orientation:
            in_target = in_target & (yaw_err < params.yaw_tol)
        reward = (
            -0.5 * reach_dist * (1.0 - holding)
            + 0.25 * holding
            - place_dist
            - (0.3 * yaw_err if self.orientation else 0.0)
            + 1.0 * in_target
            # settle bonus: momentum control rewards arriving SLOW
            - 0.1 * jnp.linalg.norm(block_vel) * in_target
            - 0.01 * jnp.sum(a**2)
        )

        state = PandaPickState(
            grip=grip,
            grip_vel=grip_vel,
            block=block,
            block_vel=block_vel,
            yaw=yaw,
            target_yaw=state.target_yaw,
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
        base = [
            state.grip,
            state.grip_vel,
            state.block,
            state.block_vel,
            state.holding[None],
            state.target,
            state.target - state.block,
        ]
        if self.orientation:
            base.append(
                jnp.stack(
                    [
                        jnp.cos(state.yaw), jnp.sin(state.yaw),
                        jnp.cos(state.target_yaw), jnp.sin(state.target_yaw),
                    ]
                )
            )
        return jnp.concatenate(base)

    def observation_space(self, params=None):
        return spaces.Box(
            -jnp.inf, jnp.inf, (17 if self.orientation else 13,), np.float32
        )

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (4 if self.orientation else 3,), np.float32)


# --------------------------------------------------------------------------
# PushCube (PandaRobotiqPushCube) — top-down planar pushing
# --------------------------------------------------------------------------


@struct.dataclass
class PushCubeState:
    pusher: jax.Array    # (2,) xy
    cube: jax.Array      # (2,) xy
    cube_vel: jax.Array  # (2,)
    target: jax.Array    # (2,)
    time: jax.Array


@struct.dataclass
class PushCubeParams:
    dt: float = 0.05
    speed: float = 1.2
    pusher_r: float = 0.05
    cube_half: float = 0.04
    # quasi-static pushing: the cube stops almost as soon as contact ends
    # (heavy cube on a high-friction table — the Robotiq push regime).
    # Low friction makes the task an ice-puck shot: the cube overshoots
    # the target and any pursuit slams it around (measured: a competent
    # scripted pusher scored WORSE than doing nothing at friction 4.0).
    friction: float = 20.0
    target_radius: float = 0.07
    max_steps_in_episode: int = struct.field(pytree_node=False, default=150)


class PushCube(Environment):
    """Top-down planar pushing (the reference's PandaRobotiqPushCube):
    a velocity-controlled pusher disc shoves a cube across a frictional
    plane to a target. No grasping — the only way to move the cube is
    non-prehensile contact, and pushing THROUGH the cube from the wrong
    side moves it the wrong way, so the policy must circle around. The
    contact is a positional de-penetration (cube pushed out along the
    contact normal, inheriting the pusher's approach velocity); ground
    friction decays the slide exponentially."""

    def __init__(self, name: str | None = None):
        self._name = name

    @property
    def default_params(self) -> PushCubeParams:
        return PushCubeParams()

    @property
    def name(self) -> str:
        return self._name or "PandaRobotiqPushCube"

    def reset_env(self, key, params):
        k_p, k_c, k_t = jax.random.split(key, 3)
        pusher = jax.random.uniform(k_p, (2,), minval=-0.8, maxval=0.8)
        cube = jax.random.uniform(k_c, (2,), minval=-0.5, maxval=0.5)
        # target at least 0.3 away from the cube so episodes need a push
        k_ang, k_r = jax.random.split(k_t)
        ang = jax.random.uniform(k_ang, (), minval=0.0, maxval=2 * jnp.pi)
        r = jax.random.uniform(k_r, (), minval=0.3, maxval=0.6)
        target = jnp.clip(
            cube + r * jnp.array([jnp.cos(ang), jnp.sin(ang)]), -0.85, 0.85
        )
        state = PushCubeState(
            pusher=pusher,
            cube=cube,
            cube_vel=jnp.zeros(2),
            target=target,
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    def step_env(self, key, state, action, params):
        a = jnp.clip(jnp.asarray(action).reshape(2), -1.0, 1.0)
        vel = a * params.speed
        pusher = jnp.clip(state.pusher + vel * params.dt, -1.0, 1.0)

        # contact: disc vs cube treated as a disc of radius cube_half
        rel = state.cube - pusher
        dist = jnp.linalg.norm(rel) + 1e-8
        overlap = jnp.maximum(
            params.pusher_r + params.cube_half - dist, 0.0
        )
        n = rel / dist
        touching = overlap > 0.0
        # de-penetrate the cube along the normal; it inherits the pusher's
        # closing velocity projected on the normal (plastic push)
        cube = state.cube + n * overlap
        v_close = jnp.maximum(jnp.dot(vel, n), 0.0)
        cube_vel = jnp.where(
            touching, state.cube_vel + n * v_close, state.cube_vel
        )
        # ground friction: exponential slide decay
        cube_vel = cube_vel * jnp.exp(-params.friction * params.dt)
        cube = jnp.clip(cube + cube_vel * params.dt, -1.0, 1.0)

        d_ct = jnp.linalg.norm(cube - state.target)
        d_pc = jnp.linalg.norm(pusher - cube)
        in_target = d_ct < params.target_radius
        # progress term: cube velocity projected on the to-target
        # direction — rewards pushing from BEHIND the cube (pushing from
        # the wrong side scores negative), the credit signal plain
        # -distance shaping is too flat to carry
        to_tgt = (state.target - cube) / (d_ct + 1e-8)
        progress = jnp.dot(cube_vel, to_tgt)
        reward = (
            -d_ct
            - 0.2 * d_pc          # stay engaged with the cube
            + 2.0 * progress
            + 1.0 * in_target
            - 0.01 * jnp.sum(a**2)
        )

        state = PushCubeState(
            pusher=pusher,
            cube=cube,
            cube_vel=cube_vel,
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
                state.pusher,
                state.cube,
                state.cube_vel,
                state.target,
                state.target - state.cube,
                state.cube - state.pusher,
            ]
        )

    def observation_space(self, params=None):
        return spaces.Box(-jnp.inf, jnp.inf, (12,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (2,), np.float32)


# --------------------------------------------------------------------------
# HandOver (AlohaHandOver) — bimanual transfer
# --------------------------------------------------------------------------


@struct.dataclass
class HandOverState:
    lgrip: jax.Array     # (2,) left gripper xz
    rgrip: jax.Array     # (2,) right gripper xz
    block: jax.Array     # (2,)
    block_vel: jax.Array
    holder: jax.Array    # () 0 = free, 1 = left hand, 2 = right hand
    target: jax.Array    # (2,) right-side elevated target
    time: jax.Array


@struct.dataclass
class HandOverParams:
    dt: float = 0.05
    speed: float = 1.2
    gravity: float = 2.5
    grasp_radius: float = 0.08
    block_half: float = 0.03
    target_radius: float = 0.08
    reach_overlap: float = 0.15  # arms overlap only near the midline
    max_steps_in_episode: int = struct.field(pytree_node=False, default=200)


class HandOver(Environment):
    """Bimanual hand-over (the reference's AlohaHandOver): the block
    starts on the LEFT table edge, the elevated target sits on the RIGHT
    — and each arm's workspace only crosses the midline by
    `reach_overlap`, so no single arm can do the task. The left arm must
    pick the block, carry it to the overlap zone, and the right arm must
    take it (grasping while the left holds transfers possession) and
    place it. 6-D action: (left vx, vz, grip, right vx, vz, grip)."""

    def __init__(self, name: str | None = None):
        self._name = name

    @property
    def default_params(self) -> HandOverParams:
        return HandOverParams()

    @property
    def name(self) -> str:
        return self._name or "AlohaHandOver"

    def reset_env(self, key, params):
        k_b, k_t, k_l, k_r = jax.random.split(key, 4)
        bx = jax.random.uniform(k_b, (), minval=-0.8, maxval=-0.4)
        k_tx, k_tz = jax.random.split(k_t)
        tx = jax.random.uniform(k_tx, (), minval=0.4, maxval=0.8)
        tz = jax.random.uniform(k_tz, (), minval=0.35, maxval=0.8)
        lx = jax.random.uniform(k_l, (), minval=-0.8, maxval=-0.2)
        rx = jax.random.uniform(k_r, (), minval=0.2, maxval=0.8)
        state = HandOverState(
            lgrip=jnp.array([lx, 0.6]),
            rgrip=jnp.array([rx, 0.6]),
            block=jnp.array([bx, params.block_half]),
            block_vel=jnp.zeros(2),
            holder=jnp.asarray(0.0),
            target=jnp.array([tx, tz]),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    def step_env(self, key, state, action, params):
        a = jnp.clip(jnp.asarray(action).reshape(6), -1.0, 1.0)
        la, ra = a[:3], a[3:]

        # per-arm workspaces overlap only around the midline
        lgrip = jnp.clip(
            state.lgrip + la[:2] * params.speed * params.dt,
            jnp.array([-1.0, 0.0]),
            jnp.array([params.reach_overlap, 1.0]),
        )
        rgrip = jnp.clip(
            state.rgrip + ra[:2] * params.speed * params.dt,
            jnp.array([-params.reach_overlap, 0.0]),
            jnp.array([1.0, 1.0]),
        )

        near_l = jnp.linalg.norm(state.block - lgrip) < params.grasp_radius
        near_r = jnp.linalg.norm(state.block - rgrip) < params.grasp_radius
        close_l, release_l = la[2] > 0.0, la[2] < -0.5
        close_r, release_r = ra[2] > 0.0, ra[2] < -0.5

        holder = state.holder
        # release by the current holder frees the block
        holder = jnp.where((holder == 1.0) & release_l, 0.0, holder)
        holder = jnp.where((holder == 2.0) & release_r, 0.0, holder)
        # the OTHER hand grasping while near takes possession (the
        # hand-over itself); a free block is taken by whichever hand
        # closes on it (left wins ties, it starts nearer)
        holder = jnp.where(
            (holder == 1.0) & near_r & close_r, 2.0, holder
        )
        holder = jnp.where(
            (holder == 0.0) & near_l & close_l, 1.0, holder
        )
        holder = jnp.where(
            (holder == 0.0) & near_r & close_r & ~(near_l & close_l),
            2.0,
            holder,
        )

        carrier = jnp.where(holder == 2.0, rgrip, lgrip)
        carrier_vel = jnp.where(
            holder == 2.0, ra[:2] * params.speed, la[:2] * params.speed
        )
        fall_vel = state.block_vel + jnp.array([0.0, -params.gravity]) * params.dt
        free_block = state.block + fall_vel * params.dt
        on_floor = free_block[1] <= params.block_half
        free_block = free_block.at[1].set(
            jnp.maximum(free_block[1], params.block_half)
        )
        free_vel = jnp.where(on_floor, jnp.zeros(2), fall_vel)
        held = holder > 0.5
        block = jnp.where(held, carrier, free_block)
        block_vel = jnp.where(held, carrier_vel, free_vel)

        place_dist = jnp.linalg.norm(block - state.target)
        in_target = place_dist < params.target_radius
        # staged shaping: approach (free) -> left hold -> right hold ->
        # place; each stage strictly dominates the previous
        reward = (
            -0.3 * jnp.linalg.norm(block - lgrip) * (holder == 0.0)
            + 0.2 * (holder == 1.0)
            + 0.5 * (holder == 2.0)
            - 0.5 * place_dist
            + 1.5 * in_target
            - 0.01 * jnp.sum(a**2)
        )

        state = HandOverState(
            lgrip=lgrip,
            rgrip=rgrip,
            block=block,
            block_vel=block_vel,
            holder=holder,
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
                state.lgrip,
                state.rgrip,
                state.block,
                state.block_vel,
                jnp.stack(
                    [
                        (state.holder == 1.0).astype(jnp.float32),
                        (state.holder == 2.0).astype(jnp.float32),
                    ]
                ),
                state.target,
                state.target - state.block,
                state.block - state.lgrip,
                state.block - state.rgrip,
            ]
        )

    def observation_space(self, params=None):
        return spaces.Box(-jnp.inf, jnp.inf, (18,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (6,), np.float32)
