"""CLI entry point: hydra-style UX over the framework's own config system.

Mirrors the reference's `python purejaxql/pqn_gymnax.py +alg=pqn_cartpole
KEY=val` surface (/root/reference/purejaxql/pqn_gymnax.py:523-530) with one
unified driver: the algorithm family is picked from the config (ALG_NAME),
not from which script you ran.

    python -m purejaxql_tpu.cli +alg=pqn_cartpole NUM_ENVS=256 SEED=3
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np


def _select_make_train(config):
    name = str(config.get("ALG_NAME", "pqn"))
    if name in ("pqn", "pqn_craftax"):
        from purejaxql_tpu.algo.pqn import make_train
        return make_train
    if name.startswith("pqn_rnn"):
        from purejaxql_tpu.algo.pqn_rnn import make_train
        return make_train
    if name.startswith("pqn_vdn"):
        from purejaxql_tpu.algo.pqn_vdn import make_train
        return make_train
    if name in ("pqn_ac", "pqn_playground"):
        from purejaxql_tpu.algo.pqn_ac import make_train
        return make_train
    raise SystemExit(
        f"Unknown ALG_NAME '{name}' (expected pqn / pqn_rnn / pqn_vdn / pqn_ac)"
    )


def single_run(config):
    from purejaxql_tpu.core.checkpoint import save_run
    from purejaxql_tpu.utils.logging import make_logger

    alg_name = config.get("ALG_NAME", "pqn")
    env_name = config["ENV_NAME"]
    logger = make_logger(config)

    make_train = _select_make_train(config)
    rng = jax.random.PRNGKey(config["SEED"])
    rngs = jax.random.split(rng, config["NUM_SEEDS"])
    train_vjit = jax.jit(jax.vmap(make_train(config, logger=logger)))

    t0 = time.time()
    outs = train_vjit(rngs)
    # Force completion by materializing a scalar (block_until_ready is
    # unreliable on tunneled backends).
    final_steps = np.asarray(
        jax.tree_util.tree_leaves(outs["runner_state"][0].timesteps)[0]
    )
    dt = time.time() - t0
    total = int(final_steps.max()) * config["NUM_SEEDS"]
    print(
        f"Training took {dt:.2f}s — {total} env steps "
        f"({total / dt:.0f} steps/s aggregate)."
    )
    if not config.get("LOG_VIA_CALLBACK", False) and config.get(
        "COLLECT_METRICS", True
    ):
        logger.log_history(outs["metrics"])
    logger.close()

    if config.get("SAVE_PATH"):
        save_dir = os.path.join(config["SAVE_PATH"], env_name)
        run_name = f"{alg_name}_{env_name}_seed{config['SEED']}"
        save_run(outs["runner_state"][0].params, config, save_dir, run_name)
        print(f"Saved params to {save_dir}/")
    return outs


def tune(config):
    """Hyperparameter sweep (wandb bayes if available, else random search
    over the same space) — reference: pqn_gymnax.py:476-520."""
    from purejaxql_tpu.utils.sweep import run_sweep

    run_sweep(config)


def main(argv=None):
    from purejaxql_tpu.core.config import compose

    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] in ("-h", "--help"):
        print(__doc__)
        print("Available algorithm configs:")
        from purejaxql_tpu.core.config import CONFIG_DIR
        for f in sorted(os.listdir(os.path.join(CONFIG_DIR, "alg"))):
            print("  +alg=" + f.removesuffix(".yaml"))
        return 0

    config = compose(overrides=argv)
    if "ENV_NAME" not in config:
        raise SystemExit(
            "No algorithm selected: pass +alg=<name> "
            "(see python -m purejaxql_tpu.cli --help)"
        )
    if config.get("HYP_TUNE"):
        tune(config)
    else:
        single_run(config)
    return 0


if __name__ == "__main__":
    sys.exit(main())
