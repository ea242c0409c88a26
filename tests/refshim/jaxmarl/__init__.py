"""jaxmarl-API shim backed by the in-tree MARL envs, so the unmodified
reference multi-agent script (pqn_vdn_rnn_jaxmarl.py:19-27) runs in-image.

Only the surface that script imports: `make`, `map_name_to_scenario`,
`overcooked_layouts`, and the baselines wrappers (LogWrapper family +
CTRolloutManager + save_params). Env names are translated to the in-tree
registry so both engines train on the exact same env code.
"""

from purejaxql_tpu.envs.marl import make_marl as _make_marl

# jaxmarl name -> (in-tree name, kwarg translation)
_NAME_MAP = {
    "MPE_simple_spread_v3": "Spread-v0",
    "HeuristicEnemySMAX": "Skirmish-v0",
    "overcooked": "Kitchen-v0",
    "hanabi": "MiniHanabi-v0",
}


def make(env_name, **kwargs):
    name = _NAME_MAP.get(env_name, env_name)
    if env_name == "HeuristicEnemySMAX":
        # the reference injects scenario=map_name_to_scenario(MAP_NAME) and
        # heuristic-AI kwargs (pqn_vdn_rnn_jaxmarl.py:656-660); the in-tree
        # Skirmish speaks map names directly
        scenario = kwargs.pop("scenario", None)
        kwargs.pop("see_enemy_actions", None)
        kwargs.pop("walls_cause_death", None)
        kwargs.pop("attack_mode", None)
        if scenario is not None:
            kwargs["map_name"] = scenario
    if env_name == "overcooked":
        kwargs.pop("layout", None)
    return _make_marl(name, **kwargs)
