"""Staged PQN API: rollout / targets / learn / evaluate as independently
jittable stage functions, plus a host-loop trainer built from them.

This is the decomposition the reference teaches in its simplified scripts
(/root/reference/purejaxql/simplified/pqn_gymnax_simple.py:73-285 — four
stage factories with a `jit` toggle and a Python-loop `train`): each stage
is separately testable and debuggable (`jit=False` runs eagerly), and the
host-loop trainer trades a little dispatch overhead for step-through
debugging and mid-run checkpointing — the fused `algo.pqn.make_train` is
the production path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.algo.exploration import eps_greedy_batch
from purejaxql_tpu.algo.pqn import build_env, _vec_reset, _vec_step
from purejaxql_tpu.algo.returns import lambda_returns
from purejaxql_tpu.algo.types import Transition
from purejaxql_tpu.core.optim import make_optimizer
from purejaxql_tpu.core.schedules import epsilon_schedule, lr_schedule
from purejaxql_tpu.core.train_state import PQNTrainState
from purejaxql_tpu.models.factory import make_q_network


@dataclass
class PQNStages:
    """Bundle of stage functions. All are pure and jittable."""

    init_agent: Callable  # (rng) -> train_state
    reset: Callable       # (rng) -> (obs, env_state)
    rollout: Callable     # (train_state, obs, env_state, rng) -> (obs', env_state', transitions, infos)
    compute_targets: Callable  # (train_state, transitions) -> targets
    learn: Callable       # (train_state, transitions, targets, rng) -> (train_state, loss, qvals)
    evaluate: Callable    # (train_state, rng) -> metrics dict
    config: Dict[str, Any]
    network: Any


def make_stages(config: Dict[str, Any], jit: bool = True) -> PQNStages:
    config = dict(config)
    config["TOTAL_TIMESTEPS"] = int(float(config["TOTAL_TIMESTEPS"]))
    config["TOTAL_TIMESTEPS_DECAY"] = int(
        float(config.get("TOTAL_TIMESTEPS_DECAY", config["TOTAL_TIMESTEPS"]))
    )
    config["NUM_UPDATES"] = (
        config["TOTAL_TIMESTEPS"] // config["NUM_STEPS"] // config["NUM_ENVS"]
    )
    config["NUM_UPDATES_DECAY"] = (
        config["TOTAL_TIMESTEPS_DECAY"] // config["NUM_STEPS"] // config["NUM_ENVS"]
    )

    train_env, test_env, base_env, env_params, mode = build_env(config)
    config["TEST_NUM_STEPS"] = config.get(
        "TEST_NUM_STEPS", getattr(env_params, "max_steps_in_episode", 1000)
    )
    config.setdefault("TEST_NUM_ENVS", config["NUM_ENVS"])

    vmap_reset = _vec_reset(train_env, env_params, config["NUM_ENVS"], mode)
    vmap_step = _vec_step(train_env, env_params, config["NUM_ENVS"], mode)
    test_reset = _vec_reset(test_env, env_params, config["TEST_NUM_ENVS"], mode)
    test_step = _vec_step(test_env, env_params, config["TEST_NUM_ENVS"], mode)

    action_dim = base_env.action_space(env_params).n
    obs_shape = train_env.observation_space(env_params).shape
    network = make_q_network(config, action_dim, obs_shape)
    eps_scheduler = epsilon_schedule(
        config["EPS_START"],
        config["EPS_FINISH"],
        config["EPS_DECAY"] * config["NUM_UPDATES_DECAY"],
    )
    rew_scale = config.get("REW_SCALE", 1.0)

    def init_agent(rng):
        init_x = jnp.zeros((1, *obs_shape))
        variables = network.init(rng, init_x, train=False)
        tx = make_optimizer(config["MAX_GRAD_NORM"], lr_schedule(config))
        return PQNTrainState.create(
            apply_fn=network.apply,
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            tx=tx,
        )

    def apply_eval(train_state, obs):
        return network.apply(
            {"params": train_state.params, "batch_stats": train_state.batch_stats},
            obs,
            train=False,
        )

    def reset(rng):
        return vmap_reset(rng)

    def rollout(train_state, obs, env_state, rng):
        def _step_env(carry, _):
            last_obs, env_state, rng = carry
            rng, rng_a, rng_s = jax.random.split(rng, 3)
            q_vals = apply_eval(train_state, last_obs)
            eps = jnp.full(config["NUM_ENVS"], eps_scheduler(train_state.n_updates))
            action = eps_greedy_batch(rng_a, q_vals, eps)
            new_obs, new_env_state, reward, done, info = vmap_step(
                rng_s, env_state, action
            )
            transition = Transition(
                obs=last_obs,
                action=action,
                reward=rew_scale * reward,
                done=done,
                next_obs=new_obs,
                q_val=q_vals,
            )
            return (new_obs, new_env_state, rng), (transition, info)

        (obs, env_state, rng), (transitions, infos) = jax.lax.scan(
            _step_env, (obs, env_state, rng), None, config["NUM_STEPS"]
        )
        return obs, env_state, transitions, infos

    def compute_targets(train_state, transitions):
        last_q = jnp.max(apply_eval(train_state, transitions.next_obs[-1]), axis=-1)
        return lambda_returns(
            last_q,
            transitions.reward,
            transitions.done,
            jnp.max(transitions.q_val, axis=-1),
            config["GAMMA"],
            config["LAMBDA"],
        )

    def learn(train_state, transitions, targets, rng):
        def _learn_epoch(carry, _):
            train_state, rng = carry

            def _learn_phase(carry, minibatch_and_target):
                train_state, rng = carry
                minibatch, target = minibatch_and_target

                def _loss_fn(params):
                    q_vals, updates = network.apply(
                        {"params": params, "batch_stats": train_state.batch_stats},
                        minibatch.obs,
                        train=True,
                        mutable=["batch_stats"],
                    )
                    chosen = jnp.take_along_axis(
                        q_vals, jnp.expand_dims(minibatch.action, -1), axis=-1
                    ).squeeze(-1)
                    loss = 0.5 * jnp.square(chosen - target).mean()
                    return loss, (updates, chosen)

                (loss, (updates, qvals)), grads = jax.value_and_grad(
                    _loss_fn, has_aux=True
                )(train_state.params)
                train_state = train_state.apply_gradients(grads=grads)
                train_state = train_state.replace(
                    grad_steps=train_state.grad_steps + 1,
                    batch_stats=updates["batch_stats"],
                )
                return (train_state, rng), (loss, qvals)

            def preprocess(x, rng):
                x = x.reshape(-1, *x.shape[2:])
                x = jax.random.permutation(rng, x)
                return x.reshape(config["NUM_MINIBATCHES"], -1, *x.shape[1:])

            rng, _rng = jax.random.split(rng)
            minibatches = jax.tree_util.tree_map(
                lambda x: preprocess(x, _rng), transitions
            )
            tgts = jax.tree_util.tree_map(lambda x: preprocess(x, _rng), targets)
            rng, _rng = jax.random.split(rng)
            (train_state, rng), (loss, qvals) = jax.lax.scan(
                _learn_phase, (train_state, rng), (minibatches, tgts)
            )
            return (train_state, rng), (loss, qvals)

        (train_state, rng), (loss, qvals) = jax.lax.scan(
            _learn_epoch, (train_state, rng), None, config["NUM_EPOCHS"]
        )
        train_state = train_state.replace(
            timesteps=train_state.timesteps
            + config["NUM_STEPS"] * config["NUM_ENVS"],
            n_updates=train_state.n_updates + 1,
        )
        return train_state, loss.mean(), qvals.mean()

    def evaluate(train_state, rng):
        def _env_step(carry, _):
            env_state, last_obs, rng = carry
            rng, _rng = jax.random.split(rng)
            q_vals = apply_eval(train_state, last_obs)
            eps = jnp.full(config["TEST_NUM_ENVS"], config.get("EPS_TEST", 0.0))
            action = eps_greedy_batch(_rng, q_vals, eps)
            new_obs, new_env_state, reward, done, info = test_step(
                _rng, env_state, action
            )
            return (new_env_state, new_obs, rng), info

        rng, _rng = jax.random.split(rng)
        init_obs, env_state = test_reset(_rng)
        _, infos = jax.lax.scan(
            _env_step, (env_state, init_obs, _rng), None, config["TEST_NUM_STEPS"]
        )
        return jax.tree_util.tree_map(
            lambda x: jnp.nanmean(jnp.where(infos["returned_episode"], x, jnp.nan)),
            infos,
        )

    maybe_jit = jax.jit if jit else (lambda f: f)
    return PQNStages(
        init_agent=maybe_jit(init_agent),
        reset=maybe_jit(reset),
        rollout=maybe_jit(rollout),
        compute_targets=maybe_jit(compute_targets),
        learn=maybe_jit(learn),
        evaluate=maybe_jit(evaluate),
        config=config,
        network=network,
    )


def train_stepwise(
    config: Dict[str, Any],
    rng: Optional[jax.Array] = None,
    jit: bool = True,
    checkpoint_every: Optional[int] = None,
    checkpoint_path: Optional[str] = None,
    on_update: Optional[Callable[[int, Dict[str, float]], None]] = None,
):
    """Host-loop trainer over the stages: debuggable, interruptible, and
    checkpointable mid-run (the fused trainer cannot be)."""
    from purejaxql_tpu.core.checkpoint import save_state

    stages = make_stages(config, jit=jit)
    config = stages.config
    rng = jax.random.PRNGKey(config.get("SEED", 0)) if rng is None else rng

    rng, _rng = jax.random.split(rng)
    train_state = stages.init_agent(_rng)
    rng, _rng = jax.random.split(rng)
    obs, env_state = stages.reset(_rng)

    history = []
    for update in range(config["NUM_UPDATES"]):
        rng, r1, r2 = jax.random.split(rng, 3)
        obs, env_state, transitions, infos = stages.rollout(
            train_state, obs, env_state, r1
        )
        targets = stages.compute_targets(train_state, transitions)
        train_state, loss, qvals = stages.learn(
            train_state, transitions, targets, r2
        )
        metrics = {
            "update": update,
            "td_loss": float(loss),
            "qvals": float(qvals),
            "returned_episode_returns": float(
                np.asarray(infos["returned_episode_returns"]).mean()
            ),
        }
        history.append(metrics)
        if on_update is not None:
            on_update(update, metrics)
        if (
            checkpoint_every
            and checkpoint_path
            and (update + 1) % checkpoint_every == 0
        ):
            from purejaxql_tpu.parallel.mesh import is_main_process

            # multi-host: one writer (params are replicated; N processes
            # racing on the same path would corrupt the checkpoint)
            if is_main_process():
                save_state(train_state, checkpoint_path)

    return train_state, history
