"""Hyperparameter sweeps.

The reference uses wandb bayes sweeps over LR (pqn_gymnax.py:476-520, plus
an 8-hparam space in pqn_vdn_rnn_jaxmarl.py:758-783). Here: if wandb is
importable, the same bayes sweep runs; otherwise a self-contained random
search over the declared space runs locally and reports the best config —
sweeps work on a bare TPU pod with no external services.
"""

from __future__ import annotations

import copy
import json
import random
import sys
import time
from typing import Any, Dict, List

import jax
import numpy as np

DEFAULT_SPACE: Dict[str, List[Any]] = {
    "LR": [0.001, 0.0005, 0.0001, 0.00005],
}


def _objective(config) -> float:
    """Train and return the mean terminal episode return."""
    from purejaxql_tpu.cli import _select_make_train

    make_train = _select_make_train(config)
    rngs = jax.random.split(
        jax.random.PRNGKey(config["SEED"]), config["NUM_SEEDS"]
    )
    outs = jax.jit(jax.vmap(make_train(config)))(rngs)
    rets = np.asarray(outs["metrics"]["returned_episode_returns"])
    return float(rets[:, -max(1, rets.shape[1] // 20):].mean())


def run_sweep(config: Dict[str, Any], count: int = None) -> Dict[str, Any]:
    space = config.get("SWEEP_SPACE", DEFAULT_SPACE)
    count = count or int(config.get("SWEEP_COUNT", 8))

    try:
        import wandb  # optional

        return _wandb_sweep(config, space, count, wandb)
    except ImportError:
        pass

    rng = random.Random(config.get("SEED", 0))
    best, best_score = None, -float("inf")
    for i in range(count):
        trial = copy.deepcopy(config)
        picks = {k: rng.choice(v) for k, v in space.items()}
        trial.update(picks)
        t0 = time.time()
        score = _objective(trial)
        print(
            json.dumps(
                {"trial": i, "picks": picks, "score": score,
                 "seconds": round(time.time() - t0, 1)}
            ),
            file=sys.stderr,
        )
        if score > best_score:
            best, best_score = picks, score
    print(json.dumps({"best": best, "score": best_score}))
    return {"best": best, "score": best_score}


def _wandb_sweep(config, space, count, wandb):
    sweep_config = {
        "name": f"{config.get('ALG_NAME', 'pqn')}_{config['ENV_NAME']}",
        "method": "bayes",
        "metric": {"name": "returned_episode_returns", "goal": "maximize"},
        "parameters": {k: {"values": v} for k, v in space.items()},
    }

    def agent_fn():
        wandb.init(project=config.get("PROJECT", ""))
        trial = copy.deepcopy(config)
        trial.update(dict(wandb.config))
        score = _objective(trial)
        wandb.log({"returned_episode_returns": score})

    sweep_id = wandb.sweep(
        sweep_config, entity=config.get("ENTITY", ""),
        project=config.get("PROJECT", ""),
    )
    wandb.agent(sweep_id, agent_fn, count=count)
    return {"sweep_id": sweep_id}
