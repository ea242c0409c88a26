"""On-chip hyperparameter sweep driver for any alg family.

Mirrors the reference's sweep setup (pqn_vdn_rnn_jaxmarl.py:758-783 declares
an 8-hparam wandb bayes space; pqn_gymnax.py:476-520 the LR space) using the
self-contained random-search fallback in utils/sweep.py — runs on a bare TPU
with no external services.

Usage:
    python scripts/sweep_alg.py pqn_vdn_smax TOTAL_TIMESTEPS=2e6 ...

Each trial trains the full (reduced-budget) config and scores the mean
return over the last 5% of updates; picks are drawn from SPACES[alg] below.
The winning picks are printed as one JSON line at the end (stdout).

Note (axon tunnel): single device executions that run >~90 s can crash the
TPU worker — keep per-trial budgets small (the default spaces pair with
~2e6-step trials) or train through algo/segmented.py instead.
"""

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from purejaxql_tpu.core.config import compose  # noqa: E402
from purejaxql_tpu.utils.sweep import run_sweep  # noqa: E402

# per-family search spaces: LR always; LAMBDA for the lambda-return
# families; EPS_DECAY where exploration dominates (cf. the reference's
# jaxmarl sweep space: LR / LAMBDA / EPS_DECAY are its top axes)
SPACES = {
    "pqn_vdn_smax": {
        "LR": [3e-4, 1e-4, 5e-5],
        "LAMBDA": [0.7, 0.85, 0.95],
        "EPS_DECAY": [0.1, 0.2],
    },
    "pqn_vdn_spread": {
        "LR": [3e-4, 1e-4, 5e-5],
        "LAMBDA": [0.5, 0.7, 0.85],
        "EPS_DECAY": [0.1, 0.2],
    },
    "pqn_vdn_kitchen": {
        "LR": [5e-4, 3e-4, 1e-4],
        "LAMBDA": [0.5, 0.7, 0.85],
        "EPS_DECAY": [0.2, 0.4],
    },
    "pqn_vdn_hanabi": {
        "LR": [5e-4, 3e-4, 1e-4],
        "LAMBDA": [0.5, 0.7, 0.85],
        "EPS_DECAY": [0.2, 0.4],
    },
}


def main():
    alg = sys.argv[1]
    overrides = sys.argv[2:]
    config = compose(alg=alg, overrides=overrides)
    config.setdefault("NUM_SEEDS", 1)
    config["SWEEP_SPACE"] = SPACES.get(alg, {"LR": [5e-4, 3e-4, 1e-4, 5e-5]})
    config.setdefault("SWEEP_COUNT", 6)
    run_sweep(config)


if __name__ == "__main__":
    main()
