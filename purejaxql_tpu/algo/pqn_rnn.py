"""RNN-PQN: the fused trainer for recurrent Q-networks.

Covers the reference's two recurrent scripts as config switches on one
engine — pqn_rnn_gymnax.py (GRU, memory window, last-action input) and
pqn_rnn_craftax.py (LSTM cells, multiple RNN layers, optimistic resets) —
with the same single-XLA-program structure as the feedforward trainer.

Algorithm shape (reference: pqn_rnn_gymnax.py:186-610):
- rollout scan carries (hidden, obs, done, action); every step runs the
  recurrent net on a length-1 time slice and stores the *incoming* hidden
  state in the transition (`last_hs`),
- a ring buffer keeps the last MEMORY_WINDOW + NUM_STEPS transitions;
  each update retrains over the whole window by replaying the stored
  initial hidden state and running truncated BPTT,
- lambda-return targets are computed *inside the loss* from the
  stop-gradient of the same forward pass — one network pass per minibatch
  serves both prediction and target,
- minibatches permute the env axis only (time stays major) so sequences
  remain intact,
- before training, a random-policy prefill fills the memory window.

TPU notes: the BPTT forward is a `nn.scan` over time of GRU/LSTM matmuls
(MXU) with the dense trunk batched over (T*B) up front; the rollout's
length-1 recurrent step fuses into the epsilon-greedy + env-step epilogue.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.algo.exploration import eps_greedy_batch
from purejaxql_tpu.algo.metrics import (
    apply_eval_subsample,
    episode_mean_metrics,
    test_interval_updates,
)
from purejaxql_tpu.algo.pqn import build_env, _vec_reset, _vec_step
from purejaxql_tpu.algo.types import RNNTransition
from purejaxql_tpu.core.optim import make_optimizer
from purejaxql_tpu.core.schedules import epsilon_schedule, lr_schedule
from purejaxql_tpu.core.train_state import PQNTrainState
from purejaxql_tpu.models.factory import resolve_norms
from purejaxql_tpu.models.rnn import RNNQNetwork
from purejaxql_tpu.utils.logging import MetricLogger


def make_train(
    config: Dict[str, Any],
    logger: Optional[MetricLogger] = None,
    pmap_axis: Optional[str] = None,
) -> Callable:
    config = apply_eval_subsample(dict(config))
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
    assert config["NUM_ENVS"] % config["NUM_MINIBATCHES"] == 0, (
        "NUM_MINIBATCHES must divide NUM_ENVS (env-axis minibatching)"
    )

    config.setdefault("ARCH", "mlp")  # recurrent trunk is dense; flatten obs
    train_env, test_env, base_env, env_params, mode = build_env(config)
    config["TEST_NUM_STEPS"] = config.get(
        "TEST_NUM_STEPS", getattr(env_params, "max_steps_in_episode", 1000)
    )
    memory_len = config.get("MEMORY_WINDOW", 0) + config["NUM_STEPS"]

    vmap_reset = _vec_reset(train_env, env_params, config["NUM_ENVS"], mode)
    vmap_step = _vec_step(train_env, env_params, config["NUM_ENVS"], mode)
    test_reset = _vec_reset(test_env, env_params, config["TEST_NUM_ENVS"], mode)
    test_step = _vec_step(test_env, env_params, config["TEST_NUM_ENVS"], mode)

    action_dim = base_env.action_space(env_params).n
    obs_shape = train_env.observation_space(env_params).shape

    norm_type, input_norm_type = resolve_norms(config)
    network = RNNQNetwork(
        action_dim=action_dim,
        hidden_size=config.get("HIDDEN_SIZE", 128),
        num_layers=config.get("NUM_LAYERS", 2),
        num_rnn_layers=config.get("NUM_RNN_LAYERS", 1),
        cell_type=config.get("RNN_CELL", "gru"),
        norm_input=config.get("NORM_INPUT", False),
        norm_type=norm_type,
        input_norm_type=input_norm_type,
        norm_axis_name=pmap_axis,
        add_last_action=config.get("ADD_LAST_ACTION", False),
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

    def train(rng: jax.Array, runner_state=None):
        """With `runner_state` from a previous invocation, continues the
        run (fused-program segmentation; see algo/segmented.py)."""
        original_rng = rng[0]

        eps_scheduler = epsilon_schedule(
            config["EPS_START"],
            config["EPS_FINISH"],
            config["EPS_DECAY"] * config["NUM_UPDATES_DECAY"],
        )
        lr = lr_schedule(config)

        def create_agent(rng):
            init_x = (
                jnp.zeros((1, 1, *obs_shape)),  # (time, batch, obs)
                jnp.zeros((1, 1)),  # done
                jnp.zeros((1, 1), dtype=jnp.int32),  # last action
            )
            init_hs = network.initialize_carry(1)
            network_variables = network.init(rng, init_hs, *init_x, train=False)
            tx = make_optimizer(config["MAX_GRAD_NORM"], lr)
            return PQNTrainState.create(
                apply_fn=network.apply,
                params=network_variables["params"],
                batch_stats=network_variables["batch_stats"],
                tx=tx,
            )

        rng, _rng = jax.random.split(rng)
        train_state = create_agent(rng)

        if pmap_axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(pmap_axis))

        def apply_step(train_state, hs, obs, done, last_action):
            """Length-1 recurrent step (adds/removes the dummy time axis)."""
            new_hs, q_vals = network.apply(
                {
                    "params": train_state.params,
                    "batch_stats": train_state.batch_stats,
                },
                hs,
                obs[np.newaxis],
                done[np.newaxis],
                last_action[np.newaxis],
                train=False,
            )
            return new_hs, q_vals.squeeze(axis=0)

        def _step_env_factory(train_state, n_envs, step_fn, eps_value):
            def _step_env(carry, _):
                hs, last_obs, last_done, last_action, env_state, rng = carry
                rng, rng_a, rng_s = jax.random.split(rng, 3)
                new_hs, q_vals = apply_step(
                    train_state, hs, last_obs, last_done, last_action
                )
                eps = jnp.full(n_envs, eps_value)
                new_action = eps_greedy_batch(rng_a, q_vals, eps)
                new_obs, new_env_state, reward, new_done, info = step_fn(
                    rng_s, env_state, new_action
                )
                transition = RNNTransition(
                    obs=last_obs,
                    action=new_action,
                    reward=rew_scale * reward,
                    done=new_done,
                    last_hs=hs,
                    last_done=last_done,
                    last_action=last_action,
                    q_val=q_vals,
                )
                return (
                    new_hs,
                    new_obs,
                    new_done,
                    new_action,
                    new_env_state,
                    rng,
                ), (transition, info)

            return _step_env

        def _update_step(runner_state, unused):
            train_state, memory_transitions, expl_state, test_metrics, rng = (
                runner_state
            )

            step_env = _step_env_factory(
                train_state,
                config["NUM_ENVS"],
                vmap_step,
                eps_scheduler(train_state.n_updates),
            )
            rng, _rng = jax.random.split(rng)
            (*expl_state, rng), (transitions, infos) = jax.lax.scan(
                step_env, (*expl_state, _rng), None, config["NUM_STEPS"]
            )
            expl_state = tuple(expl_state)

            train_state = train_state.replace(
                timesteps=train_state.timesteps
                + config["NUM_STEPS"] * config["NUM_ENVS"] * timestep_scale
            )

            # ring update: drop the oldest NUM_STEPS, append the new rollout
            memory_transitions = jax.tree_util.tree_map(
                lambda x, y: jnp.concatenate([x[config["NUM_STEPS"]:], y], axis=0),
                memory_transitions,
                transitions,
            )

            def _learn_epoch(carry, _):
                train_state, rng = carry

                def _learn_phase(carry, minibatch):
                    train_state, rng = carry
                    hs0 = jax.tree_util.tree_map(
                        lambda x: x[0], minibatch.last_hs
                    )
                    agent_in = (
                        minibatch.obs,
                        minibatch.last_done,
                        minibatch.last_action,
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
                            next_q = jnp.max(q, axis=-1)
                            return (lam_ret, next_q), lam_ret

                        lam_ret = (
                            reward[-1] + config["GAMMA"] * (1 - done[-1]) * last_q
                        )
                        last_q = jnp.max(q_vals[-1], axis=-1)
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
                            # (ops/fast_rnn.py): numerically equivalent to
                            # network.apply, one projection GEMM per layer
                            # instead of 3T small ones
                            _, q_vals, new_bs = fast_rnn_train_forward(
                                params,
                                train_state.batch_stats,
                                hs0,
                                *agent_in,
                                num_layers=config.get("NUM_LAYERS", 2),
                                num_rnn_layers=config.get("NUM_RNN_LAYERS", 1),
                                action_dim=action_dim,
                                add_last_action=config.get(
                                    "ADD_LAST_ACTION", False
                                ),
                                norm_input=config.get("NORM_INPUT", False),
                                cell_type=config.get("RNN_CELL", "gru"),
                                input_norm_type=input_norm_type,
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
                                *agent_in,
                            )
                        target_q_vals = jax.lax.stop_gradient(q_vals)
                        last_q = target_q_vals[-1].max(axis=-1)
                        target = _compute_targets(
                            last_q,
                            target_q_vals[:-1],
                            minibatch.reward[:-1],
                            minibatch.done[:-1],
                        ).reshape(-1)
                        chosen = jnp.take_along_axis(
                            q_vals,
                            jnp.expand_dims(minibatch.action, axis=-1),
                            axis=-1,
                        ).squeeze(axis=-1)
                        chosen = chosen[:-1].reshape(-1)
                        loss = 0.5 * jnp.square(chosen - target).mean()
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
                    # shuffle envs, keep time major, split into minibatches
                    x = jax.random.permutation(rng, x, axis=1)
                    x = x.reshape(
                        x.shape[0], config["NUM_MINIBATCHES"], -1, *x.shape[2:]
                    )
                    return jnp.swapaxes(x, 0, 1)

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
            if config.get("DONE_MASKED_INFO_METRICS", False):
                # report info values at episode ends only (weighted mean by
                # returned_episode), the craftax-script convention
                # (pqn_rnn_craftax.py:446-451) — without it, held values
                # diluted by unfinished envs read near zero at craftax scale
                re = infos["returned_episode"].astype(jnp.float32)
                denom = jnp.maximum(re.sum(), 1.0)
                metrics.update(
                    {k: (v * re).sum() / denom for k, v in infos.items()}
                )
            else:
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
                metrics.update({f"test/{k}": v for k, v in test_metrics.items()})

            if metric_callback is not None and use_callback:
                jax.debug.callback(metric_callback, metrics, original_rng)

            runner_state = (
                train_state,
                memory_transitions,
                tuple(expl_state),
                test_metrics,
                rng,
            )
            return runner_state, metrics if collect_metrics else {}

        def get_test_metrics(train_state, rng):
            if not config.get("TEST_DURING_TRAINING", False):
                return None

            def _greedy_env_step(step_state, _):
                hs, last_obs, last_done, last_action, env_state, rng = step_state
                rng, rng_a, rng_s = jax.random.split(rng, 3)
                new_hs, q_vals = apply_step(
                    train_state, hs, last_obs, last_done, last_action
                )
                eps = jnp.full(config["TEST_NUM_ENVS"], config["EPS_TEST"])
                new_action = eps_greedy_batch(rng_a, q_vals, eps)
                new_obs, new_env_state, reward, new_done, info = test_step(
                    rng_s, env_state, new_action
                )
                return (
                    new_hs,
                    new_obs,
                    new_done,
                    new_action,
                    new_env_state,
                    rng,
                ), info

            rng, _rng = jax.random.split(rng)
            init_obs, env_state = test_reset(_rng)
            step_state = (
                network.initialize_carry(config["TEST_NUM_ENVS"]),
                init_obs,
                jnp.zeros((config["TEST_NUM_ENVS"]), dtype=bool),
                jnp.zeros((config["TEST_NUM_ENVS"]), dtype=jnp.int32),
                env_state,
                _rng,
            )
            _, infos = jax.lax.scan(
                _greedy_env_step, step_state, None, config["TEST_NUM_STEPS"]
            )
            return episode_mean_metrics(infos, pmap_axis)

        if runner_state is None:
            rng, _rng = jax.random.split(rng)
            test_metrics = get_test_metrics(train_state, _rng)

            rng, _rng = jax.random.split(rng)
            obs, env_state = vmap_reset(_rng)
            expl_state = (
                network.initialize_carry(config["NUM_ENVS"]),
                obs,
                jnp.zeros((config["NUM_ENVS"]), dtype=bool),
                jnp.zeros((config["NUM_ENVS"]), dtype=jnp.int32),
                env_state,
            )

            # random-policy prefill of the memory window
            prefill_step = _step_env_factory(
                train_state, config["NUM_ENVS"], vmap_step, 1.0
            )
            rng, _rng = jax.random.split(rng)
            (*expl_state, rng), (memory_transitions, _) = jax.lax.scan(
                prefill_step, (*expl_state, _rng), None, memory_len
            )
            expl_state = tuple(expl_state)

            rng, _rng = jax.random.split(rng)
            runner_state = (
                train_state, memory_transitions, expl_state, test_metrics, _rng
            )
        runner_state, metrics = jax.lax.scan(
            _update_step, runner_state, None, config["NUM_UPDATES"]
        )
        return {"runner_state": runner_state, "metrics": metrics}

    return train
