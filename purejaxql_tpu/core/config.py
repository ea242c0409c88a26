"""Config system: YAML composition + CLI overrides, hydra-style UX.

The reference composes `config/config.yaml` + `config/alg/<name>.yaml` via
Hydra and flattens `config["alg"]` to the top level
(/root/reference/purejaxql/pqn_gymnax.py:429,523-526). This module provides
the same surface — UPPER_SNAKE keys, `+alg=<name>` selection, `KEY=value`
dotlist overrides — with zero external dependencies (pyyaml only).
"""

from __future__ import annotations

import ast
import copy
import os
from typing import Any, Dict, Iterable, List, Optional

import yaml

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")


def _parse_value(raw: str) -> Any:
    """Parse a CLI override value: literal if possible, else string."""
    low = raw.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none"):
        return None
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        return raw


def _set_by_path(cfg: Dict[str, Any], dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def compose(
    alg: Optional[str] = None,
    overrides: Iterable[str] = (),
    config_dir: Optional[str] = None,
    base_name: str = "config",
) -> Dict[str, Any]:
    """Compose base config + algorithm config + dotlist overrides.

    Overrides like ``NUM_ENVS=64`` or ``alg.LR=1e-3`` or ``+alg=pqn_cartpole``.
    Returns a flat dict with the alg table merged on top, matching the
    reference's `{**config, **config["alg"]}` convention.
    """
    config_dir = config_dir or CONFIG_DIR
    cfg = load_yaml(os.path.join(config_dir, f"{base_name}.yaml"))

    extra: List[str] = []
    for ov in overrides:
        ov = ov.strip()
        if not ov:
            continue
        if ov.startswith("+alg=") or ov.startswith("alg="):
            alg = ov.split("=", 1)[1]
        else:
            extra.append(ov)

    if alg is not None:
        alg_path = os.path.join(config_dir, "alg", f"{alg}.yaml")
        if not os.path.exists(alg_path):
            available = sorted(
                f.removesuffix(".yaml")
                for f in os.listdir(os.path.join(config_dir, "alg"))
            )
            raise ValueError(
                f"Unknown algorithm config '{alg}'. Available: {available}"
            )
        alg_cfg = load_yaml(alg_path)
        base_alg = cfg.get("alg") or {}
        base_alg.update(alg_cfg)
        cfg["alg"] = base_alg
        cfg.setdefault("ALG_CONFIG_NAME", alg)

    flat = dict(cfg)
    flat.update(cfg.get("alg") or {})

    # CLI overrides are applied after the alg merge so they always win
    # (hydra semantics: the command line has highest precedence).
    for ov in extra:
        if "=" not in ov:
            raise ValueError(f"Override '{ov}' is not KEY=value")
        key, raw = ov.split("=", 1)
        _set_by_path(flat, key.lstrip("+"), _parse_value(raw))
    return flat


def derive_pqn_schedule_keys(config: Dict[str, Any]) -> Dict[str, Any]:
    """Fill in NUM_UPDATES / NUM_UPDATES_DECAY and validate divisibility
    (reference: pqn_gymnax.py:80-90)."""
    config = dict(config)
    config["TOTAL_TIMESTEPS"] = int(float(config["TOTAL_TIMESTEPS"]))
    decay_steps = config.get("TOTAL_TIMESTEPS_DECAY", config["TOTAL_TIMESTEPS"])
    config["TOTAL_TIMESTEPS_DECAY"] = int(float(decay_steps))
    config["NUM_UPDATES"] = (
        config["TOTAL_TIMESTEPS"] // config["NUM_STEPS"] // config["NUM_ENVS"]
    )
    config["NUM_UPDATES_DECAY"] = (
        config["TOTAL_TIMESTEPS_DECAY"] // config["NUM_STEPS"] // config["NUM_ENVS"]
    )
    if (config["NUM_STEPS"] * config["NUM_ENVS"]) % config["NUM_MINIBATCHES"] != 0:
        raise ValueError("NUM_MINIBATCHES must divide NUM_STEPS*NUM_ENVS")
    return config


def save_config(config: Dict[str, Any], path: str) -> None:
    serializable = {
        k: v
        for k, v in config.items()
        if isinstance(v, (int, float, str, bool, list, dict, type(None)))
    }
    with open(path, "w") as f:
        yaml.safe_dump(serializable, f, sort_keys=False)


def config_snapshot(config: Dict[str, Any]) -> Dict[str, Any]:
    return copy.deepcopy(
        {
            k: v
            for k, v in config.items()
            if isinstance(v, (int, float, str, bool, list, dict, type(None)))
        }
    )
