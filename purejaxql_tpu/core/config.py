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
    # default-performance policy: on TPU, auto-enable the eligible
    # learning-verified fast paths (PARITY=strict restores bit-exact
    # reference behavior; explicitly-set flags always win)
    return resolve_fast_paths(flat)


# Envs with a single-seed Pallas mega-kernel rollout (algo/pqn.py
# fused_game_rollout / ops/pallas_rollout.py).
_FUSED_GAMES = (
    "Breakout-MinAtar", "Asterix-MinAtar", "Freeway-MinAtar",
    "SpaceInvaders-MinAtar", "Seaquest-MinAtar", "CartPole-v1",
)


def _fused_rollout_eligible(config: Dict[str, Any]) -> bool:
    """Mirror of the trainers' FUSED_ROLLOUT constraint checks
    (algo/pqn.py:243-258, algo/pqn_ac.py:143-158), plus the single-seed
    requirement (the kernels are not vmappable over seeds)."""
    if config.get("NUM_SEEDS", 1) != 1:
        return False
    alg = str(config.get("ALG_NAME", "pqn"))
    if alg in ("pqn", "pqn_craftax"):
        return (
            config.get("ENV_NAME") in _FUSED_GAMES
            and not config.get("USE_OPTIMISTIC_RESETS", False)
            and not config.get("BATCH_ENV", False)
            and config.get("NORM_TYPE") == "layer_norm"
            and not config.get("NORM_INPUT", False)
            and (
                config.get("ENV_NAME") != "CartPole-v1"
                or config.get("NUM_LAYERS", 2) == 2
            )
        )
    if alg in ("pqn_ac", "pqn_playground"):
        return (
            config.get("ENV_NAME") == "Pendulum-v1"
            and config.get("NORM_TYPE") == "layer_norm"
            and not config.get("NORM_INPUT", False)
            and not config.get("NORMALIZE_OBS", False)
            and not config.get("NORMALIZE_REWARD", False)
            and len(config.get("ACTOR_HIDDEN_SIZES") or ()) == 2
            and len(config.get("CRITIC_HIDDEN_SIZES") or ()) == 2
            and config.get("NUM_CRITICS", 2) == 2
            and config.get("ACTIVATION", "relu") == "relu"
        )
    return False


def resolve_fast_paths(
    config: Dict[str, Any], backend: Optional[str] = None
) -> Dict[str, Any]:
    """TPU default-performance policy.

    On a TPU backend, turn ON every learning-verified fast path the
    composed config is eligible for — so a user running a migrated
    reference config unchanged gets this framework's performance, not
    reference-speed. Two escape hatches, both per-key-respecting:

    - ``PARITY=strict`` disables all auto-enabling: the program stays
      bit-compatible with the reference engine (same RNG stream, same
      reduction orders) — the mode the bitwise parity suite and the
      bench's ``*_parity`` rows run in.
    - Any flag the user (or an alg YAML) sets explicitly always wins;
      resolution only fills in absent keys.

    Non-TPU backends are left untouched: the fast paths are TPU-first
    designs (Pallas kernels, MXU-shaped BPTT hoisting) and the CPU test
    suite doubles as the strict-semantics reference.

    Flags and their verification trail (ROADMAP.md / BENCH_DETAILS.json):
    FUSED_ROLLOUT (+EVAL_EARLY_EXIT), FAST_TARGETS, SKIP_NOOP_PERMUTE,
    RESET_BANK=256, FAST_BPTT. PALLAS_BPTT stays opt-in: its grad-step
    kernels pay a pathological first-run warmup on tunneled runtimes
    (bench.py rnn_cartpole_pallas note).
    """
    if str(config.get("PARITY", "fast")).lower() == "strict":
        return config
    if backend is None:
        import jax

        backend = jax.default_backend()
    if backend != "tpu":
        return config

    config = dict(config)
    alg = str(config.get("ALG_NAME", "pqn"))

    def _default(key: str, value: Any) -> None:
        if key not in config or config[key] is None:
            config[key] = value

    if alg in ("pqn", "pqn_craftax"):
        if _fused_rollout_eligible(config):
            _default("FUSED_ROLLOUT", True)
            if config["FUSED_ROLLOUT"]:
                _default("EVAL_EARLY_EXIT", True)
        if (not config.get("Q_LAMBDA", True)) and config.get(
            "NORM_TYPE"
        ) == "layer_norm":
            _default("FAST_TARGETS", True)
        if config.get("NUM_MINIBATCHES", 1) == 1:
            _default("SKIP_NOOP_PERMUTE", True)
        if config.get("USE_OPTIMISTIC_RESETS", False):
            _default("RESET_BANK", 256)
    elif alg.startswith("pqn_rnn") or alg.startswith("pqn_vdn"):
        try:
            from purejaxql_tpu.ops.fast_rnn import supports_fast_bptt

            if supports_fast_bptt(config):
                _default("FAST_BPTT", True)
        except Exception as e:
            # a broken eligibility check must not kill config composition,
            # but silently losing the ~2x default would hide the bug —
            # say what happened and fall back to the flax path
            import sys

            print(
                f"resolve_fast_paths: FAST_BPTT eligibility check failed "
                f"({type(e).__name__}: {e}); defaulting to the flax path",
                file=sys.stderr,
            )
        if alg.startswith("pqn_rnn") and config.get(
            "USE_OPTIMISTIC_RESETS", False
        ):
            _default("RESET_BANK", 256)
    elif alg in ("pqn_ac", "pqn_playground") and _fused_rollout_eligible(
        config
    ):
        _default("FUSED_ROLLOUT", True)
    return config


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
