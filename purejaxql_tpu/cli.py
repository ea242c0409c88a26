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
    if name == "pqn_host":
        from purejaxql_tpu.algo.pqn_host import make_train as make_train_host
        return make_train_host
    raise SystemExit(
        f"Unknown ALG_NAME '{name}' (expected pqn / pqn_rnn / pqn_vdn / pqn_ac)"
    )


def single_run(config):
    from purejaxql_tpu.core.checkpoint import save_run
    from purejaxql_tpu.parallel.mesh import is_main_process
    from purejaxql_tpu.utils.logging import make_logger

    alg_name = config.get("ALG_NAME", "pqn")
    env_name = config["ENV_NAME"]
    logger = make_logger(config)

    if config.get("TRAINER", "fused") == "stepwise":
        return _stepwise_run(config, logger)

    make_train = _select_make_train(config)
    rng = jax.random.PRNGKey(config["SEED"])
    if config.get("ALG_NAME") == "pqn_host":
        # host envs are stateful: single-seed, no vmap (pqn_atari.py:457-458)
        if config["NUM_SEEDS"] != 1:
            raise SystemExit("pqn_host supports NUM_SEEDS=1 only")
        if config.get("ASYNC_ENVS", False):
            # lag-1 pipelined host trainer: env stepping overlaps the
            # device learn phase (algo/pqn_host.make_train_async)
            from purejaxql_tpu.algo.pqn_host import make_train_async

            train_vjit = (lambda f: (lambda rngs: jax.tree_util.tree_map(
                lambda x: x[None], f(rngs[0]))))(make_train_async(config))
        else:
            train_vjit = jax.jit(make_train(config))
            train_vjit = (lambda f: (lambda rngs: jax.tree_util.tree_map(
                lambda x: x[None], f(rngs[0]))))(train_vjit)
    elif config.get("FUSED_ROLLOUT", False):
        # the fused-rollout Pallas kernels are single-seed programs (no
        # batched grid): run unvmapped, re-add the seed axis for the
        # save/log paths. FUSED_ROLLOUT auto-resolves only at NUM_SEEDS=1
        # (core/config.resolve_fast_paths); an explicit multi-seed request
        # gets a clear error instead of a vmap trace failure.
        if config["NUM_SEEDS"] != 1:
            raise SystemExit(
                "FUSED_ROLLOUT supports NUM_SEEDS=1 only (single-seed "
                "Pallas kernel); drop the flag or run one seed"
            )
        train_vjit = jax.jit(make_train(config, logger=logger))
        train_vjit = (lambda f: (lambda rngs: jax.tree_util.tree_map(
            lambda x: x[None], f(rngs[0]))))(train_vjit)
    else:
        train_vjit = jax.jit(jax.vmap(make_train(config, logger=logger)))
    rngs = jax.random.split(rng, config["NUM_SEEDS"])

    t0 = time.time()
    outs = train_vjit(rngs)
    # Force completion by materializing a scalar (block_until_ready is
    # unreliable on tunneled backends). The AC family carries a dict of
    # train states ({"actor", "critic"}); counters live on the actor.
    model_state = outs["runner_state"][0]
    counter_state = (
        model_state["actor"] if isinstance(model_state, dict) else model_state
    )
    final_steps = np.asarray(
        jax.tree_util.tree_leaves(counter_state.timesteps)[0]
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

    # multi-host: params are replicated over the mesh, so exactly one
    # process writes the checkpoint (SURVEY.md §5 distributed plan)
    if config.get("SAVE_PATH") and is_main_process():
        save_dir = os.path.join(config["SAVE_PATH"], env_name)
        run_name = f"{alg_name}_{env_name}_seed{config['SEED']}"
        params = (
            {k: v.params for k, v in model_state.items()}
            if isinstance(model_state, dict)
            else model_state.params
        )
        if isinstance(model_state, dict):
            # AC family: persist the obs-normalization running stats with
            # the checkpoint so inference can replay frozen normalization
            # (the reference render path's InferenceModelState norm_stats,
            # mujoco_playground_render.py:39-53). The outermost env-state
            # wrapper is NormalizeVecObservation when NORMALIZE_OBS.
            env_state = outs["runner_state"][1]
            if config.get("NORMALIZE_OBS", False) and hasattr(
                env_state, "mean"
            ):
                params["norm_stats"] = {
                    "mean": env_state.mean,
                    "var": env_state.var,
                }
        save_run(params, config, save_dir, run_name)
        print(f"Saved params to {save_dir}/")
    return outs


def _stepwise_run(config, logger):
    """Host-loop trainer path: debuggable, interruptible, resumable.

    Extra config keys: CHECKPOINT_EVERY (updates), CHECKPOINT_PATH,
    RESUME_FROM (path saved by a previous stepwise run).
    """
    from purejaxql_tpu.algo.stages import make_stages, train_stepwise
    from purejaxql_tpu.core.checkpoint import load_state, save_state
    from purejaxql_tpu.parallel.mesh import is_main_process

    ckpt_path = config.get("CHECKPOINT_PATH") or os.path.join(
        config.get("SAVE_PATH") or ".", f"{config['ENV_NAME']}_state.safetensors"
    )

    def on_update(update, metrics):
        logger.log(metrics, update)

    resume_from = config.get("RESUME_FROM")
    rng = jax.random.PRNGKey(config["SEED"])
    if resume_from:
        stages = make_stages(config)
        template = stages.init_agent(jax.random.PRNGKey(config["SEED"]))
        restored = load_state(template, resume_from)
        print(
            f"Resumed from {resume_from} at {int(restored.n_updates)} updates / "
            f"{int(restored.timesteps)} env steps"
        )
        # continue training with the restored state driving the schedules
        obs, env_state = stages.reset(rng)
        train_state = restored
        remaining = stages.config["NUM_UPDATES"] - int(restored.n_updates)
        for update in range(max(remaining, 0)):
            rng, r1, r2 = jax.random.split(rng, 3)
            obs, env_state, transitions, infos = stages.rollout(
                train_state, obs, env_state, r1
            )
            targets = stages.compute_targets(train_state, transitions)
            train_state, loss, qvals = stages.learn(
                train_state, transitions, targets, r2
            )
            on_update(int(train_state.n_updates), {"td_loss": float(loss)})
            if config.get("CHECKPOINT_EVERY") and (
                (update + 1) % config["CHECKPOINT_EVERY"] == 0
            ) and is_main_process():
                save_state(train_state, ckpt_path)
        if is_main_process():
            save_state(train_state, ckpt_path)
            print(f"State saved to {ckpt_path}")
        logger.close()
        return train_state

    ts, history = train_stepwise(
        config,
        rng=rng,
        checkpoint_every=config.get("CHECKPOINT_EVERY"),
        checkpoint_path=ckpt_path,
        on_update=on_update,
    )
    if is_main_process():
        os.makedirs(os.path.dirname(ckpt_path) or ".", exist_ok=True)
        save_state(ts, ckpt_path)
        print(f"State saved to {ckpt_path}")
    logger.close()
    return ts


def tune(config):
    """Hyperparameter sweep (wandb bayes if available, else random search
    over the same space) — reference: pqn_gymnax.py:476-520."""
    from purejaxql_tpu.utils.sweep import run_sweep

    run_sweep(config)


def main(argv=None):
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.parallel.mesh import init_distributed

    # Multi-host pods: join the cluster BEFORE any backend/device use
    # (compose() below queries the backend for the fast-path policy).
    # No-op unless cluster env vars / Cloud-TPU metadata are present.
    init_distributed()

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
