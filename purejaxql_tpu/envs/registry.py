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
    from purejaxql_tpu.envs.classic.cartpole import CartPole
    from purejaxql_tpu.envs.classic.acrobot import Acrobot
    from purejaxql_tpu.envs.classic.mountain_car import MountainCar
    from purejaxql_tpu.envs.classic.pendulum import Pendulum
    from purejaxql_tpu.envs.classic.memory_chain import MemoryChain

    _REGISTRY["CartPole-v1"] = CartPole
    _REGISTRY["Acrobot-v1"] = Acrobot
    _REGISTRY["MountainCar-v0"] = MountainCar
    _REGISTRY["Pendulum-v1"] = Pendulum
    _REGISTRY["MemoryChain-bsuite"] = MemoryChain

    try:
        from purejaxql_tpu.envs.minatar import (
            MinBreakout,
            MinAsterix,
            MinSpaceInvaders,
            MinFreeway,
        )

        _REGISTRY["Breakout-MinAtar"] = MinBreakout
        _REGISTRY["Asterix-MinAtar"] = MinAsterix
        _REGISTRY["SpaceInvaders-MinAtar"] = MinSpaceInvaders
        _REGISTRY["Freeway-MinAtar"] = MinFreeway
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
    _populate()
    if env_name not in _REGISTRY:
        raise ValueError(
            f"Unknown env '{env_name}'. Registered: {sorted(_REGISTRY)}"
        )
    env = _REGISTRY[env_name](**env_kwargs)
    return env, env.default_params


def registered_envs():
    _populate()
    return sorted(_REGISTRY)
