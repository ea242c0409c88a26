"""VDN-RNN-PQN: cooperative multi-agent Q-learning with value decomposition.

Semantics follow the reference multi-agent script
(/root/reference/purejaxql/pqn_vdn_rnn_jaxmarl.py): per-agent recurrent
Q-networks with SHARED parameters (vmapped over the agent axis during
rollout, flattened to one (agents*batch) forward during learning), legal-
action masking in both greedy and random branches of epsilon-greedy, and
the VDN joint objective — the lambda-return target bootstraps from the
SUM over agents of per-agent max legal Q, regressed against the SUM of
chosen-action Qs (value decomposition: pqn_vdn_rnn_jaxmarl.py:359-421).

Engine structure (memory window ring, in-loss targets from the stop-grad
forward, env-axis minibatching with time major, in-graph greedy eval) is
shared with the recurrent trainer.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.algo.types import MARLTransition
from purejaxql_tpu.algo.metrics import (
    apply_eval_subsample,
    episode_mean_metrics,
    test_interval_updates,
)
from purejaxql_tpu.core.optim import make_optimizer
from purejaxql_tpu.core.schedules import epsilon_schedule
from purejaxql_tpu.core.train_state import PQNTrainState
from purejaxql_tpu.envs.marl import make_marl
from purejaxql_tpu.envs.marl.base import CTRolloutManager, MARLLogWrapper
from purejaxql_tpu.models.rnn import RNNQNetwork
from purejaxql_tpu.utils.logging import MetricLogger


def get_greedy_actions(q_vals, valid_actions):
    unavail = 1 - valid_actions
    return jnp.argmax(q_vals - unavail * 1e10, axis=-1)


def masked_eps_greedy(rng, q_vals, eps, valid_actions):
    """Batched masked epsilon-greedy over one agent's (E, A) q-values
    (reference: pqn_vdn_rnn_jaxmarl.py:143-168)."""
    rng_a, rng_e = jax.random.split(rng)
    greedy_actions = get_greedy_actions(q_vals, valid_actions)

    def get_random_actions(rng, val_action):
        return jax.random.choice(
            rng,
            jnp.arange(val_action.shape[-1]),
            p=val_action * 1.0 / jnp.sum(val_action, axis=-1),
        )

    _rngs = jax.random.split(rng_a, valid_actions.shape[0])
    random_actions = jax.vmap(get_random_actions)(_rngs, valid_actions)
    return jnp.where(
        jax.random.uniform(rng_e, greedy_actions.shape) < eps,
        random_actions,
        greedy_actions,
    )


def make_train(
    config: Dict[str, Any],
    logger: Optional[MetricLogger] = None,
    pmap_axis: Optional[str] = None,
    env=None,
) -> Callable:
    config = apply_eval_subsample(dict(config))
    config["TOTAL_TIMESTEPS"] = int(float(config["TOTAL_TIMESTEPS"]))
    config["NUM_UPDATES"] = (
        config["TOTAL_TIMESTEPS"] // config["NUM_STEPS"] // config["NUM_ENVS"]
    )
    assert config["NUM_ENVS"] % config["NUM_MINIBATCHES"] == 0

    if env is None:
        env = make_marl(config["ENV_NAME"], **(config.get("ENV_KWARGS") or {}))
    env = MARLLogWrapper(env)
    num_agents = env.num_agents
    agents = env.agents

    wrapped_env = CTRolloutManager(env, batch_size=config["NUM_ENVS"])
    test_env = CTRolloutManager(env, batch_size=config["TEST_NUM_ENVS"])
    action_dim = wrapped_env.max_action_space
    obs_size = wrapped_env.obs_size
    memory_len = config.get("MEMORY_WINDOW", 0) + config["NUM_STEPS"]

    network = RNNQNetwork(
        action_dim=action_dim,
        hidden_size=config.get("HIDDEN_SIZE", 256),
        num_layers=config.get("NUM_LAYERS", 2),
        num_rnn_layers=config.get("NUM_RNN_LAYERS", 1),
        cell_type=config.get("RNN_CELL", "gru"),
        norm_input=config.get("NORM_INPUT", False),
        norm_type=config["NORM_TYPE"],
        norm_axis_name=pmap_axis,
        add_last_action=False,
        dueling=config.get("DUELING", False),
    )
    use_fast_bptt = config.get("FAST_BPTT", False)
    if use_fast_bptt:
        from purejaxql_tpu.ops.fast_rnn import (
            fast_rnn_train_forward,
            supports_fast_bptt,
        )

        if not supports_fast_bptt(config):
            raise ValueError(
                "FAST_BPTT supports the GRU + layer_norm trunk family "
                "(RNN_CELL=gru, NORM_TYPE=layer_norm, no dueling) — see "
                "ops/fast_rnn.py"
            )
    rew_scale = config.get("REW_SCALE", 1.0)
    timestep_scale = config.get("TIMESTEP_SCALE", 1)
    metric_callback = logger.make_callback() if logger is not None else None
    use_callback = config.get("LOG_VIA_CALLBACK", False)
    collect_metrics = config.get("COLLECT_METRICS", True)

    def batchify(x: dict):
        return jnp.stack([x[agent] for agent in agents], axis=0)

    def unbatchify(x):
        return {agent: x[i] for i, agent in enumerate(agents)}

    def train(rng: jax.Array):
        original_rng = rng[0]
        eps_scheduler = epsilon_schedule(
            config["EPS_START"],
            config["EPS_FINISH"],
            config["EPS_DECAY"] * config["NUM_UPDATES"],
        )

        def create_agent(rng):
            init_x = (
                jnp.zeros((1, 1, obs_size)),
                jnp.zeros((1, 1)),
                jnp.zeros((1, 1), dtype=jnp.int32),
            )
            init_hs = network.initialize_carry(1)
            network_variables = network.init(rng, init_hs, *init_x, train=False)
            import optax

            lr_scheduler = optax.linear_schedule(
                config["LR"],
                1e-10,
                config["NUM_EPOCHS"]
                * config["NUM_MINIBATCHES"]
                * config["NUM_UPDATES"],
            )
            lr = (
                lr_scheduler
                if config.get("LR_LINEAR_DECAY", False)
                else config["LR"]
            )
            tx = make_optimizer(config["MAX_GRAD_NORM"], lr)
            return PQNTrainState.create(
                apply_fn=network.apply,
                params=network_variables["params"],
                batch_stats=network_variables["batch_stats"],
                tx=tx,
            )

        # two splits before agent init, mirroring the reference's discarded
        # "INIT ENV" split (pqn_vdn_rnn_jaxmarl.py:181) + init split (:236)
        rng, _rng = jax.random.split(rng)
        rng, _rng = jax.random.split(rng)
        train_state = create_agent(rng)

        if pmap_axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(pmap_axis))

        def agents_apply(train_state, hs, obs_b, done_b):
            """vmap the shared network over the leading agent axis.
            obs_b/done_b: (A, E, ...); hs leaves: (A, E, H)."""

            def one_agent(hs, obs, done):
                new_hs, q = network.apply(
                    {
                        "params": train_state.params,
                        "batch_stats": train_state.batch_stats,
                    },
                    hs,
                    obs[np.newaxis],
                    done[np.newaxis],
                    jnp.zeros(done[np.newaxis].shape, jnp.int32),
                    train=False,
                )
                return new_hs, q.squeeze(axis=0)

            return jax.vmap(one_agent)(hs, obs_b, done_b)

        def _step_env_factory(train_state, manager, n_envs, eps, step_rew_scale=None):
            # The reference's random prefill stores rewards UNSCALED while its
            # training rollout applies REW_SCALE (pqn_vdn_rnn_jaxmarl.py:288-289
            # vs :623) — step_rew_scale lets the prefill mirror that exactly.
            if step_rew_scale is None:
                step_rew_scale = rew_scale

            def _step_env(carry, _):
                expl_state, rng = carry
                hs, last_obs, last_dones, env_state = expl_state
                rng, rng_a, rng_s = jax.random.split(rng, 3)

                obs_b = batchify(last_obs)
                done_b = batchify(last_dones).astype(jnp.float32)
                new_hs, q_vals = agents_apply(train_state, hs, obs_b, done_b)

                avail_actions = manager.get_valid_actions(env_state)
                avail_b = batchify(avail_actions)
                _rngs = jax.random.split(rng_a, num_agents)
                new_action = jax.vmap(
                    masked_eps_greedy, in_axes=(0, 0, None, 0)
                )(_rngs, q_vals, eps, avail_b)
                action_dict = unbatchify(new_action)

                new_obs, new_env_state, reward, new_done, info = (
                    manager.batch_step(rng_s, env_state, action_dict)
                )

                transition = MARLTransition(
                    obs=obs_b,
                    action=new_action,
                    reward=step_rew_scale * reward["__all__"][np.newaxis],
                    done=new_done["__all__"][np.newaxis].astype(jnp.float32),
                    last_hs=hs,
                    last_done=done_b,
                    last_action=new_action,  # kept for pytree uniformity
                    avail_actions=avail_b,
                    q_val=q_vals,
                )
                return (
                    (new_hs, new_obs, new_done, new_env_state),
                    rng,
                ), (transition, info)

            return _step_env

        def _update_step(runner_state, unused):
            train_state, memory_transitions, expl_state, test_metrics, rng = (
                runner_state
            )

            rng, _rng = jax.random.split(rng)
            step_env = _step_env_factory(
                train_state,
                wrapped_env,
                config["NUM_ENVS"],
                eps_scheduler(train_state.n_updates),
            )
            (expl_state, rng), (transitions, infos) = jax.lax.scan(
                step_env, (expl_state, _rng), None, config["NUM_STEPS"]
            )

            train_state = train_state.replace(
                timesteps=train_state.timesteps
                + config["NUM_STEPS"] * config["NUM_ENVS"] * timestep_scale
            )

            memory_transitions = jax.tree_util.tree_map(
                lambda x, y: jnp.concatenate(
                    [x[config["NUM_STEPS"]:], y], axis=0
                ),
                memory_transitions,
                transitions,
            )

            def _learn_epoch(carry, _):
                train_state, rng = carry

                def _learn_phase(carry, minibatch):
                    # minibatch leaves: (T, A, B, ...) / reward (T, 1, B)
                    train_state, rng = carry
                    hs0 = jax.tree_util.tree_map(
                        lambda x: x[0].reshape(-1, x.shape[-1]),
                        minibatch.last_hs,
                    )
                    agent_in = jax.tree_util.tree_map(
                        lambda x: x.reshape(x.shape[0], -1, *x.shape[3:]),
                        (minibatch.obs, minibatch.last_done),
                    )

                    def _compute_targets(last_q, q_vals, reward, done):
                        def _get_target(carry, rew_q_done):
                            reward, q, done = rew_q_done
                            lam_ret, next_q = carry
                            target_bootstrap = (
                                reward + config["GAMMA"] * (1 - done) * next_q
                            )
                            delta = lam_ret - next_q
                            lam_ret = (
                                target_bootstrap
                                + config["GAMMA"] * config["LAMBDA"] * delta
                            )
                            lam_ret = (1 - done) * lam_ret + done * reward
                            next_q = jnp.max(q, axis=-1).sum(axis=0)  # VDN sum
                            return (lam_ret, next_q), lam_ret

                        lam_ret = (
                            reward[-1] + config["GAMMA"] * (1 - done[-1]) * last_q
                        )
                        last_q = jnp.max(q_vals[-1], axis=-1).sum(axis=0)
                        _, targets = jax.lax.scan(
                            _get_target,
                            (lam_ret, last_q),
                            jax.tree_util.tree_map(
                                lambda x: x[:-1], (reward, q_vals, done)
                            ),
                            reverse=True,
                        )
                        return jnp.concatenate([targets, lam_ret[np.newaxis]])

                    def _loss_fn(params):
                        if use_fast_bptt:
                            # hoisted-projection BPTT forward
                            # (ops/fast_rnn.py), same contract as
                            # network.apply on the (agents*batch) flat axis
                            _, q_vals, new_bs = fast_rnn_train_forward(
                                params,
                                train_state.batch_stats,
                                hs0,
                                agent_in[0],
                                agent_in[1],
                                jnp.zeros(agent_in[1].shape, jnp.int32),
                                num_layers=config.get("NUM_LAYERS", 2),
                                num_rnn_layers=config.get(
                                    "NUM_RNN_LAYERS", 1
                                ),
                                action_dim=action_dim,
                                add_last_action=False,
                                norm_input=config.get("NORM_INPUT", False),
                                pallas=config.get("PALLAS_BPTT", False),
                                compute_dtype=(
                                    jnp.bfloat16
                                    if config.get("BF16_COMPUTE", False)
                                    else jnp.float32
                                ),
                            )
                            updates = {"batch_stats": new_bs}
                        else:
                            (_, q_vals), updates = partial(
                                network.apply, train=True,
                                mutable=["batch_stats"],
                            )(
                                {
                                    "params": params,
                                    "batch_stats": train_state.batch_stats,
                                },
                                hs0,
                                agent_in[0],
                                agent_in[1],
                                jnp.zeros(agent_in[1].shape, jnp.int32),
                            )
                        q_vals = q_vals.reshape(
                            q_vals.shape[0], num_agents, -1, q_vals.shape[-1]
                        )

                        q_target = jax.lax.stop_gradient(q_vals)
                        valid_q = q_target - (1 - minibatch.avail_actions) * 1e10

                        last_q = valid_q[-1].max(axis=-1).sum(axis=0)
                        target = _compute_targets(
                            last_q,
                            valid_q[:-1],
                            minibatch.reward[:-1, 0],
                            minibatch.done[:-1, 0],
                        ).reshape(-1)

                        chosen = jnp.take_along_axis(
                            q_vals,
                            jnp.expand_dims(minibatch.action, axis=-1),
                            axis=-1,
                        ).squeeze(axis=-1)  # (T, A, B)
                        vdn_chosen = chosen.sum(axis=1)[:-1].reshape(-1)
                        loss = jnp.mean(
                            (vdn_chosen - jax.lax.stop_gradient(target)) ** 2
                        )
                        return loss, (updates, chosen)

                    (loss, (updates, qvals)), grads = jax.value_and_grad(
                        _loss_fn, has_aux=True
                    )(train_state.params)
                    if pmap_axis is not None:
                        grads = jax.lax.pmean(grads, pmap_axis)
                    train_state = train_state.apply_gradients(grads=grads)
                    train_state = train_state.replace(
                        grad_steps=train_state.grad_steps + 1,
                        batch_stats=updates["batch_stats"],
                    )
                    return (train_state, rng), (loss, qvals)

                def preprocess_transition(x, rng):
                    # leaves (T, A, E, ...): shuffle envs, minibatch env axis
                    x = jax.random.permutation(rng, x, axis=2)
                    x = x.reshape(
                        *x.shape[:2], config["NUM_MINIBATCHES"], -1, *x.shape[3:]
                    )
                    return jnp.moveaxis(x, 2, 0)

                rng, _rng = jax.random.split(rng)
                minibatches = jax.tree_util.tree_map(
                    lambda x: preprocess_transition(x, _rng), memory_transitions
                )

                rng, _rng = jax.random.split(rng)
                (train_state, rng), (loss, qvals) = jax.lax.scan(
                    _learn_phase, (train_state, rng), minibatches
                )
                return (train_state, rng), (loss, qvals)

            rng, _rng = jax.random.split(rng)
            (train_state, rng), (loss, qvals) = jax.lax.scan(
                _learn_epoch, (train_state, rng), None, config["NUM_EPOCHS"]
            )

            train_state = train_state.replace(n_updates=train_state.n_updates + 1)
            metrics = {
                "env_step": train_state.timesteps,
                "update_steps": train_state.n_updates,
                "grad_steps": train_state.grad_steps,
                "td_loss": loss.mean(),
                "qvals": qvals.mean(),
            }
            metrics.update({k: v.mean() for k, v in infos.items()})
            if pmap_axis is not None:
                metrics = jax.lax.pmean(metrics, pmap_axis)

            if config.get("TEST_DURING_TRAINING", False):
                rng, _rng = jax.random.split(rng)
                test_metrics = jax.lax.cond(
                    train_state.n_updates
                    % test_interval_updates(config)
                    == 0,
                    lambda _: get_test_metrics(train_state, _rng),
                    lambda _: test_metrics,
                    operand=None,
                )
                metrics.update(
                    {f"test/{k}": v for k, v in test_metrics.items()}
                )

            if metric_callback is not None and use_callback:
                jax.debug.callback(metric_callback, metrics, original_rng)

            runner_state = (
                train_state,
                memory_transitions,
                expl_state,
                test_metrics,
                rng,
            )
            return runner_state, metrics if collect_metrics else {}

        def get_test_metrics(train_state, rng):
            if not config.get("TEST_DURING_TRAINING", False):
                return None

            def _greedy_env_step(carry, _):
                expl_state, rng = carry
                hs, last_obs, last_dones, env_state = expl_state
                rng, rng_s = jax.random.split(rng)
                obs_b = batchify(last_obs)
                done_b = batchify(last_dones).astype(jnp.float32)
                new_hs, q_vals = agents_apply(train_state, hs, obs_b, done_b)
                avail = batchify(test_env.get_valid_actions(env_state))
                actions = unbatchify(get_greedy_actions(q_vals, avail))
                new_obs, new_env_state, reward, new_done, info = (
                    test_env.batch_step(rng_s, env_state, actions)
                )
                return (
                    (new_hs, new_obs, new_done, new_env_state),
                    rng,
                ), info

            rng, _rng = jax.random.split(rng)
            init_obs, env_state = test_env.batch_reset(_rng)
            init_dones = {
                a: jnp.zeros(config["TEST_NUM_ENVS"], bool)
                for a in agents + ["__all__"]
            }
            init_hs = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(
                    x[None], (num_agents, *x.shape)
                ).reshape(num_agents, *x.shape),
                network.initialize_carry(config["TEST_NUM_ENVS"]),
            )
            (_, rng), infos = jax.lax.scan(
                _greedy_env_step,
                ((init_hs, init_obs, init_dones, env_state), _rng),
                None,
                config["TEST_NUM_STEPS"],
            )
            return episode_mean_metrics(infos, pmap_axis)

        rng, _rng = jax.random.split(rng)
        test_metrics = get_test_metrics(train_state, _rng)

        rng, _rng = jax.random.split(rng)
        init_obs, env_state = wrapped_env.batch_reset(_rng)
        init_dones = {
            a: jnp.zeros(config["NUM_ENVS"], bool) for a in agents + ["__all__"]
        }
        init_hs = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (num_agents, *x.shape)).reshape(
                num_agents, *x.shape
            ),
            network.initialize_carry(config["NUM_ENVS"]),
        )
        expl_state = (init_hs, init_obs, init_dones, env_state)

        # random-policy prefill
        rng, _rng = jax.random.split(rng)
        prefill = _step_env_factory(
            train_state, wrapped_env, config["NUM_ENVS"], 1.0, step_rew_scale=1.0
        )
        (expl_state, rng), (memory_transitions, _) = jax.lax.scan(
            prefill, (expl_state, _rng), None, memory_len
        )

        rng, _rng = jax.random.split(rng)
        runner_state = (
            train_state,
            memory_transitions,
            expl_state,
            test_metrics,
            _rng,
        )
        runner_state, metrics = jax.lax.scan(
            _update_step, runner_state, None, config["NUM_UPDATES"]
        )
        return {"runner_state": runner_state, "metrics": metrics}

    return train
