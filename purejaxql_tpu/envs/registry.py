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
    )

    _REGISTRY["PickPlace-v0"] = PickPlace
    _REGISTRY["PegInsert-v0"] = PegInsert
    _REGISTRY["BlockRotate-v0"] = BlockRotate

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
