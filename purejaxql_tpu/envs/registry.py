"""Env registry: `make(env_name, **env_kwargs) -> (env, env_params)`.

Mirrors the `gymnax.make` entry point the reference calls
(/root/reference/purejaxql/pqn_gymnax.py:92) but resolves to this package's
own JAX-native environments.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

from purejaxql_tpu.envs.base import Environment

_REGISTRY: Dict[str, Callable[..., Environment]] = {}


def register(name: str):
    def deco(ctor):
        _REGISTRY[name] = ctor
        return ctor

    return deco


def _populate():
    if _REGISTRY:
        return
    from functools import partial

    from purejaxql_tpu.envs.classic.cartpole import CartPole
    from purejaxql_tpu.envs.classic.acrobot import Acrobot
    from purejaxql_tpu.envs.classic.mountain_car import MountainCar
    from purejaxql_tpu.envs.classic.pendulum import Pendulum
    from purejaxql_tpu.envs.classic.memory_chain import MemoryChain
    from purejaxql_tpu.envs.classic.reacher import Reacher
    from purejaxql_tpu.envs.classic.mountain_car_continuous import (
        MountainCarContinuous,
    )
    from purejaxql_tpu.envs.classic.cartpole_swingup import CartPoleSwingUp
    from purejaxql_tpu.envs.classic.hopper import Hopper
    from purejaxql_tpu.envs.classic.pusher import Pusher
    from purejaxql_tpu.envs.classic.catch import Catch
    from purejaxql_tpu.envs.classic.deep_sea import DeepSea
    from purejaxql_tpu.envs.classic.ball_in_cup import BallInCup
    from purejaxql_tpu.envs.classic.walker import Walker
    from purejaxql_tpu.envs.classic.acrobot_swingup import AcrobotSwingup
    from purejaxql_tpu.envs.classic.point_mass import PointMass
    from purejaxql_tpu.envs.classic.swimmer import Swimmer

    _REGISTRY["CartPole-v1"] = CartPole
    _REGISTRY["Acrobot-v1"] = Acrobot
    _REGISTRY["MountainCar-v0"] = MountainCar
    _REGISTRY["Pendulum-v1"] = Pendulum
    _REGISTRY["MemoryChain-bsuite"] = MemoryChain
    _REGISTRY["Reacher-v0"] = Reacher
    _REGISTRY["MountainCarContinuous-v0"] = MountainCarContinuous
    _REGISTRY["CartPoleSwingUp-v0"] = CartPoleSwingUp
    _REGISTRY["Hopper-v0"] = Hopper
    _REGISTRY["Pusher-v0"] = Pusher
    _REGISTRY["Catch-bsuite"] = Catch
    _REGISTRY["DeepSea-bsuite"] = DeepSea
    _REGISTRY["BallInCup-v0"] = BallInCup
    _REGISTRY["Walker-v0"] = Walker

    # dm-suite-class task variants (one dynamics model, several tasks) —
    # names track the reference's playground dm-suite block
    # (/root/reference/scripts/train_playground_all.sh:7-33).
    _REGISTRY["CartPoleSwingUpSparse-v0"] = partial(
        CartPoleSwingUp, task="swingup_sparse"
    )
    _REGISTRY["CartpoleBalance-v0"] = partial(CartPoleSwingUp, task="balance")
    _REGISTRY["CartpoleBalanceSparse-v0"] = partial(
        CartPoleSwingUp, task="balance_sparse"
    )
    _REGISTRY["ReacherEasy-v0"] = partial(Reacher, task="easy")
    _REGISTRY["ReacherHard-v0"] = partial(Reacher, task="hard")
    _REGISTRY["HopperStand-v0"] = partial(Hopper, task="stand")
    _REGISTRY["WalkerStand-v0"] = partial(Walker, task="stand")
    _REGISTRY["WalkerRun-v0"] = partial(Walker, task="run")
    _REGISTRY["AcrobotSwingup-v0"] = AcrobotSwingup
    _REGISTRY["AcrobotSwingupSparse-v0"] = partial(AcrobotSwingup, sparse=True)
    _REGISTRY["PointMass-v0"] = PointMass
    _REGISTRY["SwimmerSwimmer6-v0"] = Swimmer

    from purejaxql_tpu.envs.classic.cheetah import Cheetah

    _REGISTRY["CheetahRun-v0"] = Cheetah

    # manipulation-class contact tasks (reference family:
    # train_playground_all.sh:117-163 manipulation block)
    from purejaxql_tpu.envs.classic.manipulation2d import (
        PickPlace,
        PegInsert,
        BlockRotate,
        PandaPickCube,
        PushCube,
        HandOver,
    )

    _REGISTRY["PickPlace-v0"] = PickPlace
    _REGISTRY["PegInsert-v0"] = PegInsert
    _REGISTRY["BlockRotate-v0"] = BlockRotate

    # the reference's manipulation block 1:1
    # (train_playground_all.sh:117-163)
    _REGISTRY["PandaPickCubeCartesian"] = partial(
        PickPlace, name="PandaPickCubeCartesian"
    )
    _REGISTRY["PandaPickCube"] = PandaPickCube
    _REGISTRY["PandaPickCubeOrientation"] = partial(
        PandaPickCube, orientation=True
    )
    _REGISTRY["PandaRobotiqPushCube"] = PushCube
    _REGISTRY["AlohaHandOver"] = HandOver
    _REGISTRY["AlohaSinglePegInsertion"] = partial(
        PegInsert, name="AlohaSinglePegInsertion"
    )
    _REGISTRY["LeapCubeReorient"] = partial(
        BlockRotate, task="reorient", name="LeapCubeReorient"
    )
    _REGISTRY["LeapCubeRotateZAxis"] = partial(BlockRotate, task="spin")

    # locomotion-class tasks (reference family:
    # train_playground_all.sh:53-114 — quadruped + humanoid joystick block).
    # Names mirror the reference's playground registry 1:1; each resolves
    # to a (robot preset, task) pair on the shared 3D SLIP dynamics.
    from purejaxql_tpu.envs.classic.locomotion3d import Quadruped, Biped3D

    def _quad(task, robot):
        def ctor(name=None, **kw):
            return Quadruped(task=task, robot=robot, name=name, **kw)

        return ctor

    def _biped(task, robot):
        def ctor(name=None, **kw):
            return Biped3D(task=task, robot=robot, name=name, **kw)

        return ctor

    _loco = {
        "Go1JoystickFlatTerrain": _quad("joystick", "go1"),
        "Go1JoystickRoughTerrain": _quad("joystick_rough", "go1"),
        "Go1Getup": _quad("getup", "go1"),
        "Go1Handstand": _quad("handstand", "go1"),
        "Go1Footstand": _quad("footstand", "go1"),
        "SpotFlatTerrainJoystick": _quad("joystick", "spot"),
        "SpotGetup": _quad("getup", "spot"),
        "SpotJoystickGaitTracking": _quad("inplace", "spot"),
        "BarkourJoystick": _quad("joystick", "barkour"),
        "G1JoystickFlatTerrain": _biped("joystick", "g1"),
        "G1JoystickRoughTerrain": _biped("joystick_rough", "g1"),
        "BerkeleyHumanoidJoystickFlatTerrain": _biped("joystick", "berkeley"),
        "BerkeleyHumanoidJoystickRoughTerrain": _biped(
            "joystick_rough", "berkeley"
        ),
        "T1JoystickFlatTerrain": _biped("joystick", "t1"),
        "T1JoystickRoughTerrain": _biped("joystick_rough", "t1"),
        "ApolloJoystickFlatTerrain": _biped("joystick", "apollo"),
        "Op3Joystick": _biped("joystick", "op3"),
        "H1InplaceGaitTracking": _biped("inplace", "h1"),
        "H1JoystickGaitTracking": _biped("joystick", "h1"),
        # dm-suite humanoid rows (train_playground_all.sh:22-24)
        "HumanoidStand": _biped("stand", "humanoid"),
        "HumanoidWalk": _biped("walk", "humanoid"),
        "HumanoidRun": _biped("run", "humanoid"),
    }
    for _name, _ctor in _loco.items():
        _REGISTRY[_name] = partial(_ctor, name=_name)

    # exact playground dm-suite names (train_playground_all.sh:7-33) so the
    # reference's `alg.ENV_NAME=<task>` overrides resolve unchanged; each is
    # the same ctor as its in-tree "-v0" registration
    _REGISTRY["AcrobotSwingup"] = AcrobotSwingup
    _REGISTRY["AcrobotSwingupSparse"] = partial(AcrobotSwingup, sparse=True)
    _REGISTRY["BallInCup"] = BallInCup
    _REGISTRY["CartpoleBalance"] = partial(CartPoleSwingUp, task="balance")
    _REGISTRY["CartpoleBalanceSparse"] = partial(
        CartPoleSwingUp, task="balance_sparse"
    )
    _REGISTRY["CartpoleSwingup"] = CartPoleSwingUp
    _REGISTRY["CartpoleSwingupSparse"] = partial(
        CartPoleSwingUp, task="swingup_sparse"
    )
    _REGISTRY["CheetahRun"] = Cheetah
    _REGISTRY["HopperHop"] = partial(Hopper, task="hop")
    _REGISTRY["HopperStand"] = partial(Hopper, task="stand")
    _REGISTRY["PendulumSwingup"] = Pendulum
    _REGISTRY["PointMass"] = PointMass
    _REGISTRY["ReacherEasy"] = partial(Reacher, task="easy")
    _REGISTRY["ReacherHard"] = partial(Reacher, task="hard")
    _REGISTRY["SwimmerSwimmer6"] = Swimmer
    _REGISTRY["WalkerRun"] = partial(Walker, task="run")
    _REGISTRY["WalkerStand"] = partial(Walker, task="stand")
    _REGISTRY["WalkerWalk"] = partial(Walker, task="walk")
    _REGISTRY["WalkerWalk-v0"] = partial(Walker, task="walk")
    _REGISTRY["HopperHop-v0"] = partial(Hopper, task="hop")
    _REGISTRY["PendulumSwingup-v0"] = Pendulum

    # finger + fish dm-suite domains (train_playground_all.sh:16-20)
    from purejaxql_tpu.envs.classic.finger import Finger
    from purejaxql_tpu.envs.classic.fish import Fish

    _REGISTRY["FingerSpin"] = partial(Finger, task="spin")
    _REGISTRY["FingerTurnEasy"] = partial(Finger, task="turn_easy")
    _REGISTRY["FingerTurnHard"] = partial(Finger, task="turn_hard")
    _REGISTRY["FingerSpin-v0"] = partial(Finger, task="spin")
    _REGISTRY["FingerTurnEasy-v0"] = partial(Finger, task="turn_easy")
    _REGISTRY["FingerTurnHard-v0"] = partial(Finger, task="turn_hard")
    _REGISTRY["FishSwim"] = Fish
    _REGISTRY["FishSwim-v0"] = Fish

    try:
        from purejaxql_tpu.envs.minatar import (
            MinBreakout,
            MinAsterix,
            MinSpaceInvaders,
            MinFreeway,
            MinSeaquest,
        )

        _REGISTRY["Breakout-MinAtar"] = MinBreakout
        _REGISTRY["Asterix-MinAtar"] = MinAsterix
        _REGISTRY["SpaceInvaders-MinAtar"] = MinSpaceInvaders
        _REGISTRY["Freeway-MinAtar"] = MinFreeway
        _REGISTRY["Seaquest-MinAtar"] = MinSeaquest
    except ImportError:
        pass

    try:
        from purejaxql_tpu.envs.gridworld import Forager

        _REGISTRY["Forager-v0"] = Forager
        # Compatibility alias: configs written for the reference name resolve
        # to this package's craftax-class environment.
        _REGISTRY["Craftax-Symbolic-v1"] = Forager
    except ImportError:
        pass


def make(env_name: str, **env_kwargs) -> Tuple[Environment, object]:
    """Build (env, params). Keyword args matching fields of the env's
    param dataclass override the defaults (gymnax-style ENV_KWARGS);
    remaining kwargs go to the env constructor."""
    _populate()
    if env_name not in _REGISTRY:
        # fall through to installed ecosystem packages (gymnax/craftax) —
        # in-tree names always win; see envs/external.py
        from purejaxql_tpu.envs.external import resolve_external

        resolved = resolve_external(env_name, **env_kwargs)
        if resolved is not None:
            return resolved
        raise ValueError(
            f"Unknown env '{env_name}' (not in-tree, and no installed "
            f"ecosystem package resolves it). Registered: {sorted(_REGISTRY)}"
        )
    ctor = _REGISTRY[env_name]
    probe_params = ctor().default_params
    param_fields = set(getattr(probe_params, "__dataclass_fields__", {}))
    param_kwargs = {k: v for k, v in env_kwargs.items() if k in param_fields}
    ctor_kwargs = {k: v for k, v in env_kwargs.items() if k not in param_fields}
    env = ctor(**ctor_kwargs)
    params = env.default_params
    if param_kwargs:
        params = params.replace(**param_kwargs)
    return env, params


def registered_envs():
    _populate()
    return sorted(_REGISTRY)
