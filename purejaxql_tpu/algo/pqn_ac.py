"""AC-PQN: DDPG-style actor-critic PQN for continuous control.

Semantics follow the reference playground script
(/root/reference/purejaxql/pqn_mujoco_playground.py): a deterministic tanh
actor explored with a per-env Gaussian noise ladder (linspace of stds so a
fixed fraction of envs always explores hard), an ensemble of NUM_CRITICS
Q-critics (vmapped init + apply, mean-combined), Q(lambda) returns computed
over ensemble-mean values by the same reverse scan, a Huber critic loss
summed over ensemble members, and an actor loss of -meanQ plus a
thresholded smooth-L1 penalty toward the behavior action (trust-region
flavored). Optional 1-step TD path (USE_QLAMBDA=False) recomputes targets
per-minibatch from next_obs/next_action.

Env stack (built here from this package's wrappers, mirroring
pqn_mujoco_playground.py:146-158): VecEnv -> LogVec -> ClipAction ->
NormalizeVecReward? -> NormalizeVecObservation?.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax

from purejaxql_tpu.algo.exploration import gaussian_noise_ladder
from purejaxql_tpu.algo.metrics import (
    apply_eval_subsample,
    episode_mean_metrics,
    test_interval_updates,
)
from purejaxql_tpu.algo.returns import lambda_returns
from purejaxql_tpu.core.optim import make_optimizer
from purejaxql_tpu.core.train_state import PQNTrainState
from purejaxql_tpu.envs import make as make_env
from purejaxql_tpu.envs import wrappers
from purejaxql_tpu.models.actor_critic import Actor, Critic
from purejaxql_tpu.utils.logging import MetricLogger


@chex.dataclass(frozen=True)
class ACTransition:
    done: chex.Array
    original_action: chex.Array
    action: chex.Array
    next_action: chex.Array
    value: chex.Array
    reward: chex.Array
    obs: chex.Array
    next_obs: chex.Array


def smooth_l1_loss(pred, target, beta: float = 1.0):
    diff = pred - target
    abs_diff = jnp.abs(diff)
    return jnp.where(abs_diff < beta, 0.5 * diff**2 / beta, abs_diff - 0.5 * beta)


def fused_pendulum_rollout(
    seed, noise_std, actor_params, critic_params, env_state, T,
    max_steps, linspace_noise, **kw,
):
    """Run a whole T-step AC rollout — actor forward, noise-ladder
    exploration, critic-ensemble value, Pendulum physics, auto-reset — as
    ONE Pallas kernel (ops/pallas_rollout.py) and return the per-step
    streams plus the final raw env state. Shared by the training rollout
    and the fused greedy eval; `kw` forwards use_prng/interpret for the
    CPU interpret-mode tests."""
    from purejaxql_tpu.ops import pallas_rollout as pr

    stf0, sti0 = pr.state_matrix_from_pendulum(env_state)
    (obs_seq, u, greedy, value, rew, done_f, final_obs, stf1, sti1) = (
        pr.pendulum_ac_rollout_pallas(
            seed, noise_std, actor_params, critic_params, stf0, sti0, T,
            max_steps=max_steps, linspace_noise=linspace_noise, **kw,
        )
    )
    new_env_state = pr.pendulum_from_state_matrix(stf1, sti1)
    return obs_seq, u, greedy, value, rew, done_f, final_obs, new_env_state


def build_ac_env(config):
    env, env_params = make_env(config["ENV_NAME"], **(config.get("ENV_KWARGS") or {}))
    aspace = env.action_space(env_params)
    low = float(np.asarray(aspace.low).reshape(-1)[0])
    high = float(np.asarray(aspace.high).reshape(-1)[0])
    wrapped = wrappers.VecEnv(env)
    # scrub NaN/Inf rewards+obs BEFORE episode accounting
    # (brax_wrappers.py:210-213); off only if explicitly disabled
    if config.get("SCRUB_NAN", True):
        wrapped = wrappers.ScrubNaN(wrapped)
    wrapped = wrappers.LogVec(wrapped)
    wrapped = wrappers.ClipAction(wrapped, low=low, high=high)
    if config.get("NORMALIZE_REWARD", False):
        wrapped = wrappers.NormalizeVecReward(wrapped, config["GAMMA"])
    if config.get("NORMALIZE_OBS", False):
        wrapped = wrappers.NormalizeVecObservation(wrapped)
    return wrapped, env, env_params, low, high


def make_train(
    config: Dict[str, Any],
    logger: Optional[MetricLogger] = None,
    pmap_axis: Optional[str] = None,
) -> Callable:
    config = apply_eval_subsample(dict(config))
    config["TOTAL_TIMESTEPS"] = int(float(config["TOTAL_TIMESTEPS"]))
    config["NUM_UPDATES"] = (
        config["TOTAL_TIMESTEPS"] // config["NUM_STEPS"] // config["NUM_ENVS"]
    )
    config["MINIBATCH_SIZE"] = (
        config["NUM_ENVS"] * config["NUM_STEPS"] // config["NUM_MINIBATCHES"]
    )

    env, base_env, env_params, act_low, act_high = build_ac_env(config)
    obs_shape = base_env.observation_space(env_params).shape
    action_dim = base_env.action_space(env_params).shape[0]
    config["TEST_NUM_STEPS"] = config.get(
        "TEST_NUM_STEPS", getattr(env_params, "max_steps_in_episode", 1000)
    )
    if config.get("TEST_NUM_ENVS") is None:
        config["TEST_NUM_ENVS"] = config["NUM_ENVS"]

    lr_scheduler = optax.linear_schedule(
        init_value=config["LR_START"],
        end_value=config["LR_END"],
        transition_steps=(config["NUM_UPDATES"] * config["LR_DECAY"])
        * config["NUM_MINIBATCHES"]
        * config["NUM_EPOCHS"],
    )
    lr = lr_scheduler if config.get("ANNEAL_LR", False) else config["LR_START"]
    noise_scheduler = optax.linear_schedule(
        init_value=config["NOISE_START"],
        end_value=config["NOISE_FINISH"],
        transition_steps=config["NOISE_DECAY"] * config["NUM_UPDATES"],
    )

    num_critics = config.get("NUM_CRITICS", 2)
    use_fused_rollout = config.get("FUSED_ROLLOUT", False)
    if use_fused_rollout and (
        config["ENV_NAME"] != "Pendulum-v1"
        or config.get("NORM_TYPE") != "layer_norm"
        or config.get("NORM_INPUT", False)
        or config.get("NORMALIZE_OBS", False)
        or config.get("NORMALIZE_REWARD", False)
        or len(config["ACTOR_HIDDEN_SIZES"]) != 2
        or len(config["CRITIC_HIDDEN_SIZES"]) != 2
        or num_critics != 2
        or config.get("ACTIVATION", "relu") != "relu"
    ):
        raise ValueError(
            "FUSED_ROLLOUT (AC family) supports Pendulum-v1 with layer_norm, "
            "relu, 2 hidden layers, NUM_CRITICS=2, and no obs/reward "
            "normalization (ops/pallas_rollout.py pendulum_ac_rollout_pallas)"
        )
    rew_scale = config.get("REW_SCALE", 1.0)
    timestep_scale = config.get("TIMESTEP_SCALE", 1)
    metric_callback = logger.make_callback() if logger is not None else None
    use_callback = config.get("LOG_VIA_CALLBACK", False)
    collect_metrics = config.get("COLLECT_METRICS", True)

    action_scale = jnp.asarray((act_high - act_low) / 2.0)
    action_bias = jnp.asarray((act_high + act_low) / 2.0)

    def train(rng: jax.Array):
        original_rng = rng[0]

        actor = Actor(
            action_dim,
            action_scale=action_scale,
            action_bias=action_bias,
            hidden_sizes=tuple(config["ACTOR_HIDDEN_SIZES"]),
            activation=config.get("ACTIVATION", "relu"),
            norm_type=config["NORM_TYPE"],
            init_scale=config.get("ACTOR_INIT_SCALE", 1.0),
            norm_axis_name=pmap_axis,
        )
        rng, _rng = jax.random.split(rng)
        actor_variables = actor.init(_rng, jnp.zeros(obs_shape))

        critic = Critic(
            hidden_sizes=tuple(config["CRITIC_HIDDEN_SIZES"]),
            norm_type=config["NORM_TYPE"],
            init_scale=config.get("CRITIC_INIT_SCALE", 1.0),
            norm_axis_name=pmap_axis,
        )
        rng, _rng = jax.random.split(rng)
        _rngs = jax.random.split(_rng, num_critics)
        critic_variables = jax.vmap(critic.init, in_axes=(0, None, None))(
            _rngs, jnp.zeros(obs_shape), jnp.zeros(action_dim)
        )

        train_state = {
            "actor": PQNTrainState.create(
                apply_fn=actor.apply,
                params=actor_variables["params"],
                batch_stats=actor_variables["batch_stats"],
                tx=make_optimizer(config["MAX_GRAD_NORM"], lr),
            ),
            "critic": PQNTrainState.create(
                apply_fn=critic.apply,
                params=critic_variables["params"],
                batch_stats=critic_variables["batch_stats"],
                tx=make_optimizer(config["MAX_GRAD_NORM"], lr),
            ),
        }

        if pmap_axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(pmap_axis))

        def ensemble_values(train_state, obs, action, train=False):
            """Mean-free ensemble apply: (NUM_CRITICS, ...) values."""

            def one(params, batch_stats):
                return critic.apply(
                    {"params": params, "batch_stats": batch_stats},
                    obs,
                    action,
                    train=train,
                )

            return jax.vmap(one)(
                train_state["critic"].params, train_state["critic"].batch_stats
            )

        def policy_step(train_state, obs, noise_key, noise_std=0.0):
            """Greedy actor action, its noise-ladder exploration variant,
            and the ensemble-mean value of the explored action.
            `noise_key` feeds the Gaussian draw directly — the caller owns
            the split discipline (the reference's key reuse between noise
            and env-step keys, pqn_mujoco_playground.py:261-309, is a
            caller-level fact)."""
            greedy = actor.apply(
                {
                    "params": train_state["actor"].params,
                    "batch_stats": train_state["actor"].batch_stats,
                },
                obs,
                train=False,
            )
            explored = gaussian_noise_ladder(
                noise_key, greedy, noise_std, act_low, act_high,
                scale=action_scale,
                linspace=config.get("LINSPACE_NOISE", False),
            )
            value = ensemble_values(train_state, obs, explored).mean(axis=0)
            return greedy, explored, value

        # INIT ENV
        rng, _rng = jax.random.split(rng)
        reset_rng = jax.random.split(_rng, config["NUM_ENVS"])
        obsv, env_state = env.reset(reset_rng, env_params)

        def _update_step(runner_state, unused):
            def _env_step(runner_state, unused):
                train_state, env_state, last_obs, rng, test_metrics = runner_state
                noise_std = noise_scheduler(train_state["actor"].n_updates)
                # ONE split per step, reference-exact: the reference hands
                # its carry rng to actor_critic_step (which splits it for
                # the noise draw) and then RE-SPLITS the same carry for the
                # env-step keys — so the noise key and the step-key source
                # are the same array (pqn_mujoco_playground.py:261,306-309)
                rng, _rng = jax.random.split(rng)
                greedy_action, action, value = policy_step(
                    train_state, last_obs, _rng, noise_std
                )
                rng_step = jax.random.split(_rng, config["NUM_ENVS"])
                obsv, env_state, reward, done, info = env.step(
                    rng_step, env_state, action, env_params
                )
                transition = ACTransition(
                    done=done.astype(jnp.float32),
                    original_action=greedy_action,
                    action=action,
                    next_action=action,  # filled after the rollout
                    value=value,
                    reward=rew_scale * reward,
                    obs=last_obs,
                    next_obs=obsv,
                )
                runner_state = (train_state, env_state, obsv, rng, test_metrics)
                return runner_state, (transition, info)

            if use_fused_rollout:
                # whole rollout in one Pallas kernel — actor + noise
                # ladder + critic ensemble + Pendulum physics in VMEM
                # (ops/pallas_rollout.py); LogVec episode stats replayed
                # from the (reward, done) streams, same trade as the
                # FF-PQN fused path (algo/pqn.py)
                train_state, env_state, last_obs, rng, test_metrics = (
                    runner_state
                )
                noise_now = noise_scheduler(train_state["actor"].n_updates)
                rng, _rng = jax.random.split(rng)
                seed = jax.random.randint(
                    _rng, (), 0, jnp.iinfo(jnp.int32).max
                )
                (obs_seq, u_seq, greedy_seq, val_seq, rew, done_f,
                 final_obs, new_raw_state) = fused_pendulum_rollout(
                    seed, noise_now, train_state["actor"].params,
                    train_state["critic"].params, env_state.env_state,
                    config["NUM_STEPS"],
                    max_steps=int(env_params.max_steps_in_episode),
                    linspace_noise=config.get("LINSPACE_NOISE", True),
                )
                next_obs = jnp.concatenate(
                    [obs_seq[1:], final_obs[None]], axis=0
                )
                traj_batch = ACTransition(
                    done=done_f,
                    original_action=greedy_seq,
                    action=u_seq,
                    next_action=u_seq,  # filled after the rollout
                    value=val_seq,
                    reward=rew_scale * rew,
                    obs=obs_seq,
                    next_obs=next_obs,
                )

                def _log_replay(carry, rd):
                    ep_r, ep_l = carry
                    r, dn = rd
                    ner, nel = ep_r + r, ep_l + 1
                    nd = 1.0 - dn
                    info = {
                        "returned_episode_returns": ner * dn,
                        "returned_episode_lengths": (
                            nel * dn.astype(jnp.int32)
                        ),
                        "returned_episode": dn.astype(bool),
                        "original_reward": r,
                    }
                    return (ner * nd, nel * nd.astype(jnp.int32)), info

                (ep_r, ep_l), raw_infos = jax.lax.scan(
                    _log_replay,
                    (env_state.episode_returns, env_state.episode_lengths),
                    (rew, done_f),
                )
                # carry the last *returned* values forward between dones,
                # LogVec's returned_episode_* semantics
                def _hold(carry, x):
                    val, mask = x
                    held = jnp.where(mask, val, carry)
                    return held, held

                rr0 = env_state.returned_episode_returns
                rl0 = env_state.returned_episode_lengths
                rr_last, rr = jax.lax.scan(
                    _hold, rr0,
                    (raw_infos["returned_episode_returns"],
                     raw_infos["returned_episode"]),
                )
                rl_last, rl = jax.lax.scan(
                    _hold, rl0,
                    (raw_infos["returned_episode_lengths"],
                     raw_infos["returned_episode"]),
                )
                ts = env_state.timestep + jnp.arange(
                    1, config["NUM_STEPS"] + 1, dtype=jnp.int32
                )
                infos = {
                    "returned_episode_returns": rr,
                    "returned_episode_lengths": rl,
                    "returned_episode": raw_infos["returned_episode"],
                    "timestep": jnp.broadcast_to(
                        ts[:, None], done_f.shape
                    ),
                    "original_reward": raw_infos["original_reward"],
                }
                env_state = env_state.replace(
                    env_state=new_raw_state,
                    episode_returns=ep_r,
                    episode_lengths=ep_l,
                    returned_episode_returns=rr_last,
                    returned_episode_lengths=rl_last,
                    timestep=env_state.timestep + config["NUM_STEPS"],
                )
                runner_state = (
                    train_state, env_state, final_obs, rng, test_metrics
                )
            else:
                runner_state, (traj_batch, infos) = jax.lax.scan(
                    _env_step, runner_state, None, config["NUM_STEPS"]
                )

            train_state, env_state, last_obs, rng, test_metrics = runner_state
            rng, _rng = jax.random.split(rng)
            noise_std = noise_scheduler(train_state["actor"].n_updates)
            # here the reference's actor_critic_step DOES consume its own
            # internal split of _rng for the noise draw
            _, noise_key = jax.random.split(_rng)
            _, last_action, last_val = policy_step(
                train_state, last_obs, noise_key, noise_std
            )
            next_actions = jnp.concatenate(
                (traj_batch.next_action[1:], last_action[np.newaxis])
            )
            traj_batch = traj_batch.replace(next_action=next_actions)

            # Q(lambda) over ensemble-mean values — the same shared
            # reverse-scan kernel every family uses (algo/returns.py),
            # with the recorded values standing in for max-Q
            targets = lambda_returns(
                last_val,
                traj_batch.reward,
                traj_batch.done,
                traj_batch.value,
                config["GAMMA"],
                config["LAMBDA"],
            )

            def _learn_epoch(carry, _):
                def _learn_phase(train_state, minibatch_and_target):
                    minibatch, target = minibatch_and_target

                    def _critic_loss_fn(critic_params):
                        def train_pass(obs, act):
                            def one(params, batch_stats):
                                return critic.apply(
                                    {"params": params,
                                     "batch_stats": batch_stats},
                                    obs, act,
                                    train=True, mutable=["batch_stats"],
                                )

                            return jax.vmap(one)(
                                critic_params,
                                train_state["critic"].batch_stats,
                            )

                        if config.get("USE_QLAMBDA", True):
                            values, updates = train_pass(
                                minibatch.obs, minibatch.action
                            )
                            tgt = target
                        else:
                            # 1-step TD recomputed per minibatch from the
                            # stop-gradient ensemble at (next_obs,
                            # next_action), one fused double-batch pass
                            all_q, updates = train_pass(
                                jnp.concatenate(
                                    (minibatch.obs, minibatch.next_obs)
                                ),
                                jnp.concatenate(
                                    (minibatch.action, minibatch.next_action)
                                ),
                            )
                            values, next_values = jnp.split(all_q, 2, axis=1)
                            q_next = jax.lax.stop_gradient(next_values).mean(
                                axis=0
                            )
                            tgt = (
                                minibatch.reward
                                + (1 - minibatch.done) * config["GAMMA"] * q_next
                            )

                        per_member = jax.vmap(smooth_l1_loss, in_axes=(0, None))(
                            values, jax.lax.stop_gradient(tgt)
                        )
                        loss = jnp.sum(jax.vmap(jnp.mean)(per_member))
                        return loss, (updates, {"value_loss": per_member.mean()})

                    def _actor_loss_fn(actor_params):
                        action, updates = actor.apply(
                            {
                                "params": actor_params,
                                "batch_stats": train_state["actor"].batch_stats,
                            },
                            minibatch.obs,
                            train=True,
                            mutable=["batch_stats"],
                        )
                        q = ensemble_values(
                            train_state, minibatch.obs, action
                        ).mean(axis=0)

                        # trust-region-flavored penalty: free inside
                        # THRESHOLD of the behavior action (in normalized
                        # units), smooth-L1 beyond it
                        norm_diff = jnp.abs(
                            (action - minibatch.original_action - action_bias)
                            / action_scale
                        ).mean(axis=-1)
                        pen = smooth_l1_loss(
                            action, minibatch.original_action
                        ).mean(axis=-1)
                        penalty = jnp.where(
                            norm_diff < config["THRESHOLD"],
                            0.0,
                            config["PENALTY_COEFF"] * pen,
                        )
                        loss = jnp.mean(-q + penalty)
                        return loss, (
                            updates,
                            {
                                "policy_loss": q.mean(),
                                "actor_penalty_loss": pen.mean(),
                            },
                        )

                    (
                        critic_loss,
                        (critic_bs_update, critic_loss_infos),
                    ), critic_grads = jax.value_and_grad(
                        _critic_loss_fn, has_aux=True
                    )(train_state["critic"].params)
                    if pmap_axis is not None:
                        critic_grads = jax.lax.pmean(critic_grads, pmap_axis)
                    train_state_critic = train_state["critic"].apply_gradients(
                        grads=critic_grads
                    )
                    train_state_critic = train_state_critic.replace(
                        grad_steps=train_state["critic"].grad_steps + 1,
                        batch_stats=critic_bs_update["batch_stats"],
                    )

                    (
                        actor_loss,
                        (actor_bs_update, actor_loss_infos),
                    ), actor_grads = jax.value_and_grad(
                        _actor_loss_fn, has_aux=True
                    )(train_state["actor"].params)
                    if pmap_axis is not None:
                        actor_grads = jax.lax.pmean(actor_grads, pmap_axis)
                    train_state_actor = train_state["actor"].apply_gradients(
                        grads=actor_grads
                    )
                    train_state_actor = train_state_actor.replace(
                        grad_steps=train_state["actor"].grad_steps + 1,
                        batch_stats=actor_bs_update["batch_stats"],
                    )

                    train_state = {
                        "actor": train_state_actor,
                        "critic": train_state_critic,
                    }
                    loss_infos = {**critic_loss_infos, **actor_loss_infos}
                    return train_state, (critic_loss, actor_loss, loss_infos)

                train_state, rng = carry

                def preprocess_transition(x, rng):
                    # (T, E, ...) -> shared-key shuffle -> minibatches,
                    # identical machinery to the discrete trainers
                    x = x.reshape(-1, *x.shape[2:])
                    x = jax.random.permutation(rng, x)
                    return x.reshape(
                        config["NUM_MINIBATCHES"], -1, *x.shape[1:]
                    )

                rng, _rng = jax.random.split(rng)
                minibatches = jax.tree_util.tree_map(
                    lambda x: preprocess_transition(x, _rng), traj_batch
                )
                mb_targets = jax.tree_util.tree_map(
                    lambda x: preprocess_transition(x, _rng), targets
                )
                train_state, loss_info = jax.lax.scan(
                    _learn_phase, train_state, (minibatches, mb_targets)
                )
                return (train_state, rng), loss_info

            (train_state, rng), (critic_loss, actor_loss, loss_infos) = (
                jax.lax.scan(
                    _learn_epoch, (train_state, rng), None,
                    config["NUM_EPOCHS"],
                )
            )

            train_state["actor"] = train_state["actor"].replace(
                timesteps=(train_state["actor"].n_updates + 1)
                * config["NUM_ENVS"]
                * config["NUM_STEPS"]
                * timestep_scale,
                n_updates=train_state["actor"].n_updates + 1,
            )

            metrics = {
                "env_step": train_state["actor"].timesteps,
                "update_steps": train_state["actor"].n_updates,
                "grad_steps_actor": train_state["actor"].grad_steps,
                "grad_steps_critic": train_state["critic"].grad_steps,
                "noise": noise_scheduler(train_state["actor"].n_updates),
                "value_loss": critic_loss.mean(),
                "loss_actor": actor_loss.mean(),
            }
            metrics.update({k: v.mean() for k, v in infos.items()})
            if pmap_axis is not None:
                metrics = jax.lax.pmean(metrics, pmap_axis)

            if config.get("TEST_DURING_TRAINING", False):
                rng, _rng = jax.random.split(rng)
                test_metrics = jax.lax.cond(
                    train_state["actor"].n_updates
                    % test_interval_updates(config)
                    == 0,
                    lambda _: get_test_metrics(train_state, env_state, _rng),
                    lambda _: test_metrics,
                    operand=None,
                )
                metrics.update({f"test/{k}": v for k, v in test_metrics.items()})

            if metric_callback is not None and use_callback:
                jax.debug.callback(metric_callback, metrics, original_rng)

            runner_state = (train_state, env_state, last_obs, rng, test_metrics)
            return runner_state, metrics if collect_metrics else {}

        def get_test_metrics(train_state, training_env_state, rng):
            if not config.get("TEST_DURING_TRAINING", False):
                return None

            if use_fused_rollout:
                # greedy eval through the same Pallas kernel (noise 0),
                # scanned in NUM_STEPS chunks so the kernel instance is
                # shared shape-wise with training when TEST_NUM_ENVS ==
                # NUM_ENVS (mirrors algo/pqn.py's fused eval)
                chunk = config["NUM_STEPS"]
                n_chunks = -(-config["TEST_NUM_STEPS"] // chunk)
                rng, _rng = jax.random.split(rng)
                reset_rng = jax.random.split(_rng, config["TEST_NUM_ENVS"])
                _, test_state = env.reset(reset_rng, env_params)
                rng, _rng = jax.random.split(rng)
                seed0 = jax.random.randint(
                    _rng, (), 0, jnp.iinfo(jnp.int32).max - n_chunks * chunk
                )

                def _chunk(raw_state, i):
                    (_, _, _, _, rew, done_f, _, raw_state) = (
                        fused_pendulum_rollout(
                            seed0 + i * chunk, jnp.float32(0.0),
                            train_state["actor"].params,
                            train_state["critic"].params, raw_state, chunk,
                            max_steps=int(env_params.max_steps_in_episode),
                            linspace_noise=config.get(
                                "LINSPACE_NOISE", True
                            ),
                        )
                    )
                    return raw_state, (rew, done_f)

                _, (rews, dones) = jax.lax.scan(
                    _chunk, test_state.env_state, jnp.arange(n_chunks)
                )
                rews = rews.reshape(-1, rews.shape[-1])
                dones = dones.reshape(-1, dones.shape[-1])

                def _ep(carry, rd):
                    ep_r, ep_l = carry
                    r, dn = rd
                    ner, nel = ep_r + r, ep_l + 1
                    info = {
                        "returned_episode_returns": ner,
                        "returned_episode_lengths": nel,
                        "returned_episode": dn.astype(bool),
                    }
                    keep = 1.0 - dn
                    return (ner * keep, nel * keep), info

                zero = jnp.zeros(rews.shape[-1], jnp.float32)
                _, infos = jax.lax.scan(_ep, (zero, zero), (rews, dones))
                infos = jax.tree_util.tree_map(
                    lambda x: x[: config["TEST_NUM_STEPS"]], infos
                )
                return episode_mean_metrics(infos, pmap_axis)

            # reference eval semantics (pqn_mujoco_playground.py:689-761):
            # fresh test envs but the TRAINING normalization statistics
            # (obs-norm state swapped in, init obs re-normalized with the
            # training stats — including the reference's double-normalize
            # of the initial obs), each env's FIRST episode counted via a
            # latched running_done, and step keys drawn from the second of
            # two splits per step.
            def _env_step(carry, _):
                env_state, last_obs, rng, returns = carry
                rng, _rng = jax.random.split(rng)  # discarded (reference)
                action = actor.apply(
                    {
                        "params": train_state["actor"].params,
                        "batch_stats": train_state["actor"].batch_stats,
                    },
                    last_obs,
                    train=False,
                )
                rng, _rng = jax.random.split(rng)
                rng_step = jax.random.split(_rng, config["TEST_NUM_ENVS"])
                obsv, env_state, reward, done, info = env.step(
                    rng_step, env_state, action, env_params
                )
                alive = ~returns["running_done"]
                returns = {
                    "running_returns": jnp.where(
                        alive,
                        returns["running_returns"] + info["original_reward"],
                        returns["running_returns"],
                    ),
                    "running_len": jnp.where(
                        alive,
                        returns["running_len"] + 1,
                        returns["running_len"],
                    ),
                    "running_done": returns["running_done"] | done,
                }
                return (env_state, obsv, rng, returns), info

            rng, _rng = jax.random.split(rng)
            reset_rng = jax.random.split(_rng, config["TEST_NUM_ENVS"])
            init_obs, reset_env_state = env.reset(reset_rng, env_params)
            if config.get("NORMALIZE_OBS", False):
                env_state = training_env_state.replace(
                    env_state=reset_env_state.env_state
                )
                init_obs = (init_obs - env_state.mean) / jnp.sqrt(
                    env_state.var + 1e-8
                )
            else:
                env_state = reset_env_state
            returns = {
                "running_returns": jnp.zeros((config["TEST_NUM_ENVS"],)),
                "running_len": jnp.zeros(
                    (config["TEST_NUM_ENVS"],), jnp.float32
                ),
                "running_done": jnp.zeros(
                    (config["TEST_NUM_ENVS"],), dtype=bool
                ),
            }
            (_, _, _, returns), _ = jax.lax.scan(
                _env_step, (env_state, init_obs, _rng, returns), None,
                config["TEST_NUM_STEPS"],
            )
            ret_sum = returns["running_returns"].sum()
            len_sum = returns["running_len"].sum()
            done_sum = returns["running_done"].sum()
            n_test = jnp.asarray(float(config["TEST_NUM_ENVS"]))
            if pmap_axis is not None:
                ret_sum = jax.lax.psum(ret_sum, pmap_axis)
                len_sum = jax.lax.psum(len_sum, pmap_axis)
                done_sum = jax.lax.psum(done_sum, pmap_axis)
                n_test = jax.lax.psum(n_test, pmap_axis)
            return {
                "returned_episode_returns": ret_sum / done_sum,
                "returned_episode_lengths": len_sum / done_sum,
                "done_episodes": done_sum / n_test,
            }

        rng, _rng = jax.random.split(rng)
        test_metrics = get_test_metrics(train_state, env_state, _rng)

        # the reference seeds the update scan with the SECOND half of this
        # split (pqn_mujoco_playground.py:766-767)
        rng, _rng = jax.random.split(rng)
        runner_state = (train_state, env_state, obsv, _rng, test_metrics)
        runner_state, metrics = jax.lax.scan(
            _update_step, runner_state, None, config["NUM_UPDATES"]
        )
        return {"runner_state": runner_state, "metrics": metrics}

    return train
