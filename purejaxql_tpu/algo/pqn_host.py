"""FF-PQN over host (C++) environments — the Atari/EnvPool-style path.

Mirrors the reference's pqn_atari.py architecture: external envs stepped by
a C++ pool on the host CPU, bridged into the jitted training program as an
ordered host callback threaded through the scan carry (the reference uses
EnvPool's XLA custom-call handle the same way, pqn_atari.py:235-237,
atari_wrapper.py:119-146). Everything else — epsilon-greedy, Q(lambda)
reverse scan, epoch/minibatch TD updates — is the standard engine.

Environment reset happens OUTSIDE jit (host envs are stateful,
pqn_atari.py:161-162) and seeds cannot vmap (pqn_atari.py:457-458) — both
constraints inherited from hosting real external envs.

NOTE: requires a backend with host-callback support (CPU / standard TPU
runtimes; not the tunneled axon backend).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.algo.exploration import eps_greedy_batch
from purejaxql_tpu.algo.returns import lambda_returns_closure
from purejaxql_tpu.algo.types import Transition
from purejaxql_tpu.core.optim import make_optimizer
from purejaxql_tpu.core.schedules import epsilon_schedule, lr_schedule
from purejaxql_tpu.core.train_state import PQNTrainState
from purejaxql_tpu.envs.hostpool import HostEnvPool, make_callback_env
from purejaxql_tpu.models.factory import make_q_network


def make_train(config: Dict[str, Any], pool: Optional[HostEnvPool] = None):
    """Build `train(rng) -> {"runner_state", "metrics"}` over a host pool.

    Single-seed only (stateful external envs).
    """
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

    # Inline eval envs, the pqn_atari pattern (pqn_atari.py:138-143,
    # 229-232): TEST_ENVS extra envs live in the SAME pool, act with
    # eps=0, and are stripped from the learn batch. One pool, one forward
    # pass, eval rides along for free.
    test_envs = (
        int(config.get("TEST_ENVS", 0))
        if config.get("TEST_DURING_TRAINING", False)
        else 0
    )
    total_envs = config["NUM_ENVS"] + test_envs

    if pool is None:
        pool = HostEnvPool(
            config["ENV_NAME"],
            num_envs=total_envs,
            seed=config.get("SEED", 0),
        )
    assert pool.num_envs == total_envs
    reset_fn, step_fn = make_callback_env(pool)

    # human-normalized eval scores when the game is in the published
    # random/human table (atari_wrapper.py:152-157 role)
    from purejaxql_tpu.utils.atari_scores import ATARI_SCORES

    score_game = config.get("SCORE_GAME", config["ENV_NAME"])
    norm_scores = ATARI_SCORES.get(score_game)

    # grid games (rank-3 obs) get the CNN unless the config pins ARCH —
    # the pqn_atari shape: C++ envs + conv Q-net
    obs_shape = pool.obs_shape
    network = make_q_network(config, pool.num_actions, obs_shape)
    rew_scale = config.get("REW_SCALE", 1.0)

    def shape_obs(flat_obs):
        return flat_obs.reshape(flat_obs.shape[0], *obs_shape)

    def train(rng: jax.Array):
        eps_scheduler = epsilon_schedule(
            config["EPS_START"],
            config["EPS_FINISH"],
            config["EPS_DECAY"] * config["NUM_UPDATES_DECAY"],
        )

        def create_agent(rng):
            init_x = jnp.zeros((1, *obs_shape))
            variables = network.init(rng, init_x, train=False)
            tx = make_optimizer(config["MAX_GRAD_NORM"], lr_schedule(config))
            return PQNTrainState.create(
                apply_fn=network.apply,
                params=variables["params"],
                batch_stats=variables["batch_stats"],
                tx=tx,
            )

        rng, _rng = jax.random.split(rng)
        train_state = create_agent(rng)

        # host reset outside the scan (stateful external envs)
        token, init_obs = reset_fn()
        init_obs = shape_obs(init_obs)

        def apply_eval(train_state, obs):
            return network.apply(
                {
                    "params": train_state.params,
                    "batch_stats": train_state.batch_stats,
                },
                obs,
                train=False,
            )

        def _update_step(runner_state, unused):
            train_state, token, last_obs, ep_stats, rng = runner_state

            def _step_env(carry, _):
                token, last_obs, ep_stats, rng = carry
                rng, rng_a = jax.random.split(rng)
                q_vals = apply_eval(train_state, last_obs)
                # train envs follow the schedule; inline test envs are
                # greedy (eps=0), pqn_atari.py:229-232
                eps = jnp.concatenate(
                    [
                        jnp.full(
                            config["NUM_ENVS"],
                            eps_scheduler(train_state.n_updates),
                        ),
                        jnp.zeros(test_envs),
                    ]
                ) if test_envs else jnp.full(
                    config["NUM_ENVS"], eps_scheduler(train_state.n_updates)
                )
                action = eps_greedy_batch(rng_a, q_vals, eps)
                token2, new_obs, reward, done = step_fn(token, action)
                new_obs = shape_obs(new_obs)
                done_f = done.astype(jnp.float32)
                # episode accounting for ALL envs (JaxLogEnvPoolWrapper
                # role, atari_wrapper.py:119-157) — pure in-graph replay
                ep_r, ep_l, ret_r, ret_l = ep_stats
                ner, nel = ep_r + reward, ep_l + 1
                keep = 1.0 - done_f
                ret_r = ret_r * keep + ner * done_f
                ret_l = (
                    ret_l * keep.astype(jnp.int32)
                    + nel * done.astype(jnp.int32)
                )
                ep_stats = (ner * keep, nel * keep.astype(jnp.int32),
                            ret_r, ret_l)
                transition = Transition(
                    obs=last_obs,
                    action=action,
                    reward=rew_scale * reward,
                    done=done_f,
                    next_obs=new_obs,
                    q_val=q_vals,
                )
                return (token2, new_obs, ep_stats, rng), transition

            rng, _rng = jax.random.split(rng)
            (token, last_obs, ep_stats, rng), transitions = jax.lax.scan(
                _step_env,
                (token, last_obs, ep_stats, _rng),
                None,
                config["NUM_STEPS"],
            )

            if test_envs:
                # strip the greedy eval envs from the learn batch
                # (pqn_atari.py:261-263)
                transitions = jax.tree_util.tree_map(
                    lambda x: x[:, : -test_envs], transitions
                )

            train_state = train_state.replace(
                timesteps=train_state.timesteps
                + config["NUM_STEPS"] * config["NUM_ENVS"]
            )

            last_train_obs = (
                last_obs[: -test_envs] if test_envs else last_obs
            )
            last_q = jnp.max(
                apply_eval(train_state, last_train_obs), axis=-1
            )
            lambda_targets = lambda_returns_closure(
                last_q,
                transitions.reward,
                transitions.done,
                jnp.max(transitions.q_val, axis=-1),
                config["GAMMA"],
                config["LAMBDA"],
            )

            def _learn_epoch(carry, _):
                train_state, rng = carry

                def _learn_phase(carry, minibatch_and_target):
                    train_state, rng = carry
                    minibatch, target = minibatch_and_target

                    def _loss_fn(params):
                        q_vals, updates = network.apply(
                            {
                                "params": params,
                                "batch_stats": train_state.batch_stats,
                            },
                            minibatch.obs,
                            train=True,
                            mutable=["batch_stats"],
                        )
                        chosen = jnp.take_along_axis(
                            q_vals, jnp.expand_dims(minibatch.action, -1), -1
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
                    return (train_state, rng), loss

                def preprocess(x, rng):
                    x = x.reshape(-1, *x.shape[2:])
                    x = jax.random.permutation(rng, x)
                    return x.reshape(config["NUM_MINIBATCHES"], -1, *x.shape[1:])

                rng, _rng = jax.random.split(rng)
                minibatches = jax.tree_util.tree_map(
                    lambda x: preprocess(x, _rng), transitions
                )
                targets = jax.tree_util.tree_map(
                    lambda x: preprocess(x, _rng), lambda_targets
                )
                rng, _rng = jax.random.split(rng)
                (train_state, rng), losses = jax.lax.scan(
                    _learn_phase, (train_state, rng), (minibatches, targets)
                )
                return (train_state, rng), losses

            rng, _rng = jax.random.split(rng)
            (train_state, rng), losses = jax.lax.scan(
                _learn_epoch, (train_state, rng), None, config["NUM_EPOCHS"]
            )
            train_state = train_state.replace(
                n_updates=train_state.n_updates + 1
            )
            ret_r, ret_l = ep_stats[2], ep_stats[3]
            metrics = {
                "env_step": train_state.timesteps,
                "td_loss": losses.mean(),
                "reward_per_step": transitions.reward.mean(),
                # 1/mean-episode-length: falls as the policy improves
                "done_rate": transitions.done.mean(),
                "returned_episode_returns": (
                    ret_r[: -test_envs] if test_envs else ret_r
                ).mean(),
                "returned_episode_lengths": (
                    ret_l[: -test_envs] if test_envs else ret_l
                ).mean(),
            }
            if test_envs:
                test_ret = ret_r[-test_envs:].mean()
                metrics["test/returned_episode_returns"] = test_ret
                metrics["test/returned_episode_lengths"] = (
                    ret_l[-test_envs:].astype(jnp.float32).mean()
                )
                if norm_scores is not None:
                    rand_s, human_s = norm_scores
                    metrics["test/human_normalized_score"] = (
                        test_ret - rand_s
                    ) / (human_s - rand_s)
            return (train_state, token, last_obs, ep_stats, rng), metrics

        ep_stats0 = (
            jnp.zeros(total_envs),
            jnp.zeros(total_envs, jnp.int32),
            jnp.zeros(total_envs),
            jnp.zeros(total_envs, jnp.int32),
        )
        rng, _rng = jax.random.split(rng)
        runner_state = (train_state, token, init_obs, ep_stats0, _rng)
        runner_state, metrics = jax.lax.scan(
            _update_step, runner_state, None, config["NUM_UPDATES"]
        )
        return {"runner_state": runner_state, "metrics": metrics}

    return train


def make_train_async(config: Dict[str, Any], pool: Optional[HostEnvPool] = None):
    """Asynchronous double-buffered host trainer (ASYNC_ENVS=True).

    The synchronous path above threads every env step through an ordered
    io_callback inside one fused program, so host env time and device
    learn time strictly serialize — EnvPool's async bridge overlaps them
    (SURVEY.md §3.2; the reference hides Atari stepping under the GPU's
    grad steps). This trainer restores that overlap with a lag-1
    pipeline:

        rollout(params[u-1]) for batch u+1   (worker thread: host C++
                                              envs + jitted policy fwd)
        learn(batch u)                       (main thread: jitted device
                                              program)

    The worker steps the C++ pool (ctypes releases the GIL; the pool has
    its own thread team) while the device executes the learn phase of the
    previous batch. Acting params lag the learner by exactly one update —
    the off-policy staleness Q(lambda) already tolerates (epsilon-greedy
    data collection); learning verified on the bundled Pong plug-ins.

    Single-seed, like every external-env path (pqn_atari.py:457-458).
    """
    import queue
    import threading

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

    test_envs = (
        int(config.get("TEST_ENVS", 0))
        if config.get("TEST_DURING_TRAINING", False)
        else 0
    )
    total_envs = config["NUM_ENVS"] + test_envs
    if pool is None:
        pool = HostEnvPool(
            config["ENV_NAME"], num_envs=total_envs, seed=config.get("SEED", 0)
        )
    assert pool.num_envs == total_envs

    from purejaxql_tpu.utils.atari_scores import ATARI_SCORES

    norm_scores = ATARI_SCORES.get(
        config.get("SCORE_GAME", config["ENV_NAME"])
    )

    obs_shape = pool.obs_shape
    network = make_q_network(config, pool.num_actions, obs_shape)
    rew_scale = config.get("REW_SCALE", 1.0)
    T, E = config["NUM_STEPS"], config["NUM_ENVS"]

    eps_scheduler = epsilon_schedule(
        config["EPS_START"],
        config["EPS_FINISH"],
        config["EPS_DECAY"] * config["NUM_UPDATES_DECAY"],
    )

    @jax.jit
    def policy_step(params, batch_stats, obs, eps_train, rng):
        q_vals = network.apply(
            {"params": params, "batch_stats": batch_stats},
            obs.reshape(obs.shape[0], *obs_shape),
            train=False,
        )
        eps = jnp.concatenate(
            [jnp.full(E, eps_train), jnp.zeros(test_envs)]
        ) if test_envs else jnp.full(E, eps_train)
        actions = eps_greedy_batch(rng, q_vals, eps)
        return actions, q_vals

    @jax.jit
    def learn_update(train_state, obs, actions, rewards, dones, q_vals,
                     final_obs, rng):
        """One full epoch/minibatch learn pass on a collected batch.
        obs: (T, E_total, obs_dim) flat; strips test envs, computes
        lambda-targets with the LEARNER's bootstrap, runs
        NUM_EPOCHS x NUM_MINIBATCHES grad steps."""
        def strip(x):
            return x[:, :E] if test_envs else x

        obs_s = strip(obs).reshape(T, E, *obs_shape)
        # final_obs is (total_envs, obs_dim): slice the ENV axis (the
        # feature-axis strip() is for (T, E, ...) streams only)
        next_obs_last = final_obs[:E].reshape(E, *obs_shape)
        transitions = Transition(
            obs=obs_s,
            action=strip(actions),
            reward=rew_scale * strip(rewards),
            done=strip(dones),
            next_obs=obs_s,  # placeholder; targets use q_val streams
            q_val=strip(q_vals),
        )
        last_q = jnp.max(
            network.apply(
                {
                    "params": train_state.params,
                    "batch_stats": train_state.batch_stats,
                },
                next_obs_last,
                train=False,
            ),
            axis=-1,
        )
        targets = lambda_returns_closure(
            last_q,
            transitions.reward,
            transitions.done,
            jnp.max(transitions.q_val, axis=-1),
            config["GAMMA"],
            config["LAMBDA"],
        )

        def _learn_epoch(carry, _):
            train_state, rng = carry

            def _learn_phase(carry, mb):
                train_state, rng = carry
                minibatch, target = mb

                def _loss_fn(params):
                    q, updates = network.apply(
                        {
                            "params": params,
                            "batch_stats": train_state.batch_stats,
                        },
                        minibatch.obs,
                        train=True,
                        mutable=["batch_stats"],
                    )
                    chosen = jnp.take_along_axis(
                        q, jnp.expand_dims(minibatch.action, -1), -1
                    ).squeeze(-1)
                    return 0.5 * jnp.square(chosen - target).mean(), updates

                (loss, updates), grads = jax.value_and_grad(
                    _loss_fn, has_aux=True
                )(train_state.params)
                train_state = train_state.apply_gradients(grads=grads)
                train_state = train_state.replace(
                    grad_steps=train_state.grad_steps + 1,
                    batch_stats=updates["batch_stats"],
                )
                return (train_state, rng), loss

            def preprocess(x, rng):
                x = x.reshape(-1, *x.shape[2:])
                x = jax.random.permutation(rng, x)
                return x.reshape(config["NUM_MINIBATCHES"], -1, *x.shape[1:])

            rng, _rng = jax.random.split(rng)
            minibatches = jax.tree_util.tree_map(
                lambda x: preprocess(x, _rng), transitions
            )
            tgts = preprocess(targets, _rng)
            (train_state, rng), losses = jax.lax.scan(
                _learn_phase, (train_state, rng), (minibatches, tgts)
            )
            return (train_state, rng), losses

        (train_state, rng), losses = jax.lax.scan(
            _learn_epoch, (train_state, rng), None, config["NUM_EPOCHS"]
        )
        train_state = train_state.replace(
            timesteps=train_state.timesteps + T * E,
            n_updates=train_state.n_updates + 1,
        )
        return train_state, losses.mean()

    def train(rng: jax.Array):
        init_x = jnp.zeros((1, *obs_shape))
        rng, _rng = jax.random.split(rng)
        variables = network.init(rng, init_x, train=False)
        tx = make_optimizer(config["MAX_GRAD_NORM"], lr_schedule(config))
        train_state = PQNTrainState.create(
            apply_fn=network.apply,
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            tx=tx,
        )

        obs = pool.reset()
        ep_r = np.zeros(total_envs, np.float32)
        ep_l = np.zeros(total_envs, np.int64)
        ret_r = np.zeros(total_envs, np.float32)
        ret_l = np.zeros(total_envs, np.int64)

        def rollout(snapshot, obs0, eps_value, rollout_key):
            """Worker-side: T host env steps under the snapshot policy.
            Returns stacked numpy streams + the final obs."""
            params, batch_stats = snapshot
            rngs = jax.random.split(rollout_key, T)
            o = obs0
            obs_b = np.empty((T, total_envs, pool.obs_dim), np.float32)
            act_b = np.empty((T, total_envs), np.int32)
            rew_b = np.empty((T, total_envs), np.float32)
            don_b = np.empty((T, total_envs), np.float32)
            q_b = np.empty((T, total_envs, pool.num_actions), np.float32)
            for t in range(T):
                actions, q_vals = policy_step(
                    params, batch_stats, o, eps_value, rngs[t]
                )
                actions = np.asarray(actions)
                obs_b[t] = o
                act_b[t] = actions
                q_b[t] = np.asarray(q_vals)
                o, rew, done = pool.step(actions)  # ctypes: GIL released
                rew_b[t] = rew
                don_b[t] = done
            return obs_b, act_b, rew_b, don_b, q_b, o

        result_q: "queue.Queue" = queue.Queue(maxsize=1)

        def worker(snapshot, obs0, eps_value, rollout_key):
            # enqueue exceptions too: a dead worker must crash the run,
            # not leave the main loop blocked on result_q.get() forever
            try:
                result_q.put(rollout(snapshot, obs0, eps_value, rollout_key))
            except BaseException as e:  # noqa: BLE001
                result_q.put(e)

        metrics_hist = []
        snapshot = (train_state.params, train_state.batch_stats)
        rng, roll_rng, loop_rng = jax.random.split(rng, 3)
        thread = threading.Thread(
            target=worker,
            args=(snapshot, obs, float(eps_scheduler(0)),
                  jax.random.fold_in(roll_rng, 0)),
            daemon=True,
        )
        thread.start()
        for u in range(config["NUM_UPDATES"]):
            got = result_q.get()
            if isinstance(got, BaseException):
                raise got
            obs_b, act_b, rew_b, don_b, q_b, obs = got
            # episode accounting (host side, all envs)
            for t in range(T):
                ep_r += rew_b[t]
                ep_l += 1
                d = don_b[t] > 0.5
                ret_r = np.where(d, ep_r, ret_r)
                ret_l = np.where(d, ep_l, ret_l)
                ep_r = np.where(d, 0.0, ep_r)
                ep_l = np.where(d, 0, ep_l)
            # launch the NEXT rollout under the CURRENT (lag-1) params
            # while the device learns on this batch
            if u + 1 < config["NUM_UPDATES"]:
                snapshot = (train_state.params, train_state.batch_stats)
                eps_value = float(eps_scheduler(u + 1))
                thread = threading.Thread(
                    target=worker,
                    args=(snapshot, obs, eps_value,
                          jax.random.fold_in(roll_rng, u + 1)),
                    daemon=True,
                )
                thread.start()
            loop_rng, _rng = jax.random.split(loop_rng)
            train_state, loss = learn_update(
                train_state, obs_b, act_b, rew_b, don_b, q_b, obs, _rng
            )
            row = {
                "update": u,
                "td_loss": float(loss),
                "returned_episode_returns": float(ret_r[:E].mean()),
            }
            if test_envs:
                test_ret = float(ret_r[E:].mean())
                row["test/returned_episode_returns"] = test_ret
                if norm_scores is not None:
                    rs, hs = norm_scores
                    row["test/human_normalized_score"] = (
                        (test_ret - rs) / (hs - rs)
                    )
            metrics_hist.append(row)

        metrics = {
            k: np.array([m.get(k, np.nan) for m in metrics_hist])
            for k in metrics_hist[-1]
        } if metrics_hist else {}
        return {"runner_state": (train_state,), "metrics": metrics}

    return train
