"""Multi-agent environments (jaxmarl-style protocol)."""

from purejaxql_tpu.envs.marl.base import (
    CTRolloutManager,
    MARLLogWrapper,
    MultiAgentEnv,
)
from purejaxql_tpu.envs.marl.spread import Spread
from purejaxql_tpu.envs.marl.skirmish import Skirmish
from purejaxql_tpu.envs.marl.kitchen import Kitchen
from purejaxql_tpu.envs.marl.hanabi import MiniHanabi

_MARL_REGISTRY = {
    "Spread-v0": Spread,
    "simple_spread": Spread,
    "Skirmish-v0": Skirmish,
    "Kitchen-v0": Kitchen,
    "MiniHanabi-v0": MiniHanabi,
    # compatibility aliases for reference-style configs
    "HeuristicEnemySMAX": Skirmish,
    "overcooked": Kitchen,
    "hanabi": MiniHanabi,
}


def make_marl(name: str, **kwargs) -> MultiAgentEnv:
    if name not in _MARL_REGISTRY:
        # fall through to an installed jaxmarl (its envs speak this
        # protocol natively) — in-tree names always win
        from purejaxql_tpu.envs.external import resolve_external_marl

        env = resolve_external_marl(name, **kwargs)
        if env is not None:
            return env
        raise ValueError(
            f"Unknown MARL env '{name}' (not in-tree, and jaxmarl is not "
            f"installed or doesn't know it). Registered: "
            f"{sorted(_MARL_REGISTRY)}"
        )
    return _MARL_REGISTRY[name](**kwargs)
