"""FF-PQN: the fused single-XLA-program trainer for feedforward Q-networks.

One `make_train(config)` covers the reference's three feedforward scripts —
pqn_gymnax.py (MLP + vmapped envs), pqn_minatar.py (CNN), pqn_craftax.py
(large batch, optimistic resets, optional 1-step TD) — as config switches on
a single engine. The entire run (env stepping, epsilon-greedy exploration,
Q(lambda) reverse scan, epoch/minibatch SGD, periodic greedy evaluation,
metric emission) is traced once and compiled into a single XLA program:
`lax.scan(_update_step, ..., NUM_UPDATES)` exactly like the reference
(pqn_gymnax.py:418-420), and seeds batch via `jax.jit(jax.vmap(train))`.

RNG discipline replicates the reference split-for-split (SURVEY.md §2.5 #13)
— required for bitwise trajectory parity under a fixed seed.

TPU design notes:
- The rollout scan's per-step network apply is a batched (E, obs)·(obs, H)
  matmul — MXU work; epsilon-greedy and env dynamics fuse into its epilogue.
- The learn phase reshapes (T, E) -> (T*E,) once, permutes with a single
  shared key, and scans minibatches; the permutation gather is the only
  HBM-bound op and is amortized over NUM_EPOCHS by XLA CSE.
- Metrics stream to the host via `jax.debug.callback` (async, off the
  critical path); stacked in-graph metrics are optional (COLLECT_METRICS)
  so 1e6-update runs don't hold useless HBM.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from purejaxql_tpu.algo.exploration import eps_greedy_batch
from purejaxql_tpu.algo.metrics import (
    apply_eval_subsample,
    episode_mean_metrics,
    test_interval_updates,
)
from purejaxql_tpu.algo.returns import lambda_returns
from purejaxql_tpu.algo.types import Transition
from purejaxql_tpu.core.optim import make_optimizer
from purejaxql_tpu.core.schedules import epsilon_schedule, lr_schedule
from purejaxql_tpu.core.train_state import PQNTrainState
from purejaxql_tpu.envs import make as make_env
from purejaxql_tpu.envs import wrappers
from purejaxql_tpu.models.factory import make_q_network
from purejaxql_tpu.utils.logging import MetricLogger


def build_env(config):
    """Construct the train/test env pair per the config's env family.

    - Default ("split" mode): raw env + Flatten (MLP only) + Log, vectorized
      by splitting one key into per-env keys and vmapping — the gymnax-script
      convention (pqn_gymnax.py:92-104).
    - USE_OPTIMISTIC_RESETS: Log(raw) inside an OptimisticResetVecEnv — the
      craftax-script convention (pqn_craftax.py:96-114).
    - BATCH_ENV: Log(raw) inside BatchEnv (internal key splitting).
    """
    env_kwargs = dict(config.get("ENV_KWARGS") or {})
    if config.get("LOG_ACHIEVEMENTS", False):
        env_kwargs["log_achievements"] = True
    env, env_params = make_env(config["ENV_NAME"], **env_kwargs)
    obs_shape = env.observation_space(env_params).shape
    flatten = config.get("FLATTEN_OBS", len(obs_shape) == 1 or config.get("ARCH") == "mlp")

    if flatten and len(obs_shape) > 1:
        env = wrappers.FlattenObservation(env)
    log_env = wrappers.Log(env)

    if config.get("USE_OPTIMISTIC_RESETS", False):
        if config.get("RESET_BANK", 0):
            # opt-in fast path: worldgen amortized through a rolling reset
            # bank (see wrappers.BankedResetVecEnv docstring)
            train_env = wrappers.BankedResetVecEnv(
                log_env,
                num_envs=config["NUM_ENVS"],
                reset_ratio=min(
                    config["OPTIMISTIC_RESET_RATIO"], config["NUM_ENVS"]
                ),
                bank_size=int(config["RESET_BANK"]),
                refresh_every=int(
                    config.get("RESET_BANK_REFRESH_EVERY", 16)
                ),
            )
        else:
            train_env = wrappers.OptimisticResetVecEnv(
                log_env,
                num_envs=config["NUM_ENVS"],
                reset_ratio=min(
                    config["OPTIMISTIC_RESET_RATIO"], config["NUM_ENVS"]
                ),
            )
        test_env = wrappers.OptimisticResetVecEnv(
            log_env,
            num_envs=config["TEST_NUM_ENVS"],
            reset_ratio=min(config["OPTIMISTIC_RESET_RATIO"], config["TEST_NUM_ENVS"]),
        )
        mode = "batched"
    elif config.get("BATCH_ENV", False):
        train_env = wrappers.BatchEnv(log_env, num_envs=config["NUM_ENVS"])
        test_env = wrappers.BatchEnv(log_env, num_envs=config["TEST_NUM_ENVS"])
        mode = "batched"
    else:
        train_env = test_env = log_env
        mode = "split"
    return train_env, test_env, env, env_params, mode


def _vec_reset(env, env_params, n_envs, mode):
    if mode == "batched":
        return lambda rng: env.reset(rng, env_params)
    return lambda rng: jax.vmap(env.reset, in_axes=(0, None))(
        jax.random.split(rng, n_envs), env_params
    )


def _vec_step(env, env_params, n_envs, mode):
    if mode == "batched":
        return lambda rng, state, action: env.step(rng, state, action, env_params)
    return lambda rng, state, action: jax.vmap(env.step, in_axes=(0, 0, 0, None))(
        jax.random.split(rng, n_envs), state, action, env_params
    )


def fused_game_rollout(env_name, seed, eps, params, env_state, T, **kw):
    """Run a whole T-step rollout — env dynamics + net forward +
    eps-greedy + auto-reset — as ONE Pallas kernel (ops/pallas_rollout.py)
    and return the (obs, action, reward, done, q) streams, the final obs,
    and the raw final env state. Shared by the training rollout and the
    fused in-graph eval. `kw` forwards to the per-game kernel wrapper
    (use_prng/interpret, for the CPU interpret-mode tests)."""
    from purejaxql_tpu.ops import pallas_rollout as pr

    if env_name == "CartPole-v1":
        stf0, sti0 = pr.state_matrix_from_cartpole(env_state)
        (obs_seq, act, rew, done_i, q_seq, final_obs, a1, a2) = (
            pr.cartpole_rollout_pallas(seed, eps, params, stf0, sti0, T, **kw)
        )
        new_env_state = pr.cartpole_from_state_matrix(a1, a2)
    elif env_name == "Asterix-MinAtar":
        st0 = pr.state_matrix_from_asterix(env_state)
        (obs_seq, act, rew, done_i, q_seq, final_obs, a1) = (
            pr.asterix_rollout_pallas(seed, eps, params, st0, T, **kw)
        )
        new_env_state = pr.asterix_from_state_matrix(a1)
    elif env_name == "Freeway-MinAtar":
        st0 = pr.state_matrix_from_freeway(env_state)
        (obs_seq, act, rew, done_i, q_seq, final_obs, a1) = (
            pr.freeway_rollout_pallas(seed, eps, params, st0, T, **kw)
        )
        new_env_state = pr.freeway_from_state_matrix(a1)
    elif env_name == "Seaquest-MinAtar":
        st0 = pr.state_matrix_from_seaquest(env_state)
        (obs_seq, act, rew, done_i, q_seq, final_obs, a1) = (
            pr.seaquest_rollout_pallas(seed, eps, params, st0, T, **kw)
        )
        new_env_state = pr.seaquest_from_state_matrix(a1)
    elif env_name == "SpaceInvaders-MinAtar":
        packed = pr.state_matrix_from_space_invaders(env_state)
        (obs_seq, act, rew, done_i, q_seq, final_obs, a1, a2, a3, a4) = (
            pr.space_invaders_rollout_pallas(seed, eps, params, *packed, T, **kw)
        )
        new_env_state = pr.space_invaders_from_state_matrix(a1, a2, a3, a4)
    else:
        st0, brick0 = pr.state_matrix_from_breakout(env_state)
        (obs_seq, act, rew, done_i, q_seq, final_obs, a1, a2) = (
            pr.breakout_rollout_pallas(seed, eps, params, st0, brick0, T, **kw)
        )
        new_env_state = pr.breakout_from_state_matrix(a1, a2)
    return obs_seq, act, rew, done_i, q_seq, final_obs, new_env_state


def make_train(
    config: Dict[str, Any],
    logger: Optional[MetricLogger] = None,
    pmap_axis: Optional[str] = None,
    shard_hint: Optional[Callable] = None,
) -> Callable:
    """Build the jittable `train(rng) -> {"runner_state", "metrics"}`.

    With `pmap_axis` set, the trainer becomes the per-shard body of an SPMD
    program (run it under `jax.shard_map` over a mesh axis of that name; see
    parallel/spmd.py): NUM_ENVS is then the *local* env count, the agent is
    initialized identically on every shard (same rng), the env/exploration
    rng stream is decorrelated per shard by folding in the axis index, and
    gradients + batch-norm statistics + metrics are pmean'd over the axis so
    learner replicas stay in lockstep — the data-parallel actor/learner
    layout over ICI that BASELINE.json's north star asks for.

    `shard_hint` is the alternative (GSPMD/jit-sharding) scaling hook: a
    pytree→pytree function (normally `with_sharding_constraint` to an
    "env"-sharded NamedSharding; see parallel/spmd.py:make_train_gspmd)
    applied to the env-batch exploration state at creation and once per
    update, from which XLA's partitioner propagates shardings through the
    whole fused program. Mutually exclusive with `pmap_axis` in spirit:
    pmap_axis = explicit per-shard SPMD (shard_map), shard_hint = global
    program + compiler partitioning.
    """

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
    assert (
        config["NUM_STEPS"] * config["NUM_ENVS"]
    ) % config["NUM_MINIBATCHES"] == 0, "NUM_MINIBATCHES must divide NUM_STEPS*NUM_ENVS"

    train_env, test_env, base_env, env_params, mode = build_env(config)
    config["TEST_NUM_STEPS"] = config.get(
        "TEST_NUM_STEPS", getattr(env_params, "max_steps_in_episode", 1000)
    )

    vmap_reset = _vec_reset(train_env, env_params, config["NUM_ENVS"], mode)
    vmap_step = _vec_step(train_env, env_params, config["NUM_ENVS"], mode)
    test_reset = _vec_reset(test_env, env_params, config["TEST_NUM_ENVS"], mode)
    test_step = _vec_step(test_env, env_params, config["TEST_NUM_ENVS"], mode)

    action_dim = base_env.action_space(env_params).n
    obs_shape = train_env.observation_space(env_params).shape

    network = make_q_network(config, action_dim, obs_shape, norm_axis_name=pmap_axis)
    rew_scale = config.get("REW_SCALE", 1.0)
    timestep_scale = config.get("TIMESTEP_SCALE", 1)
    # In-graph streaming needs host-callback support, which some TPU
    # runtimes lack; default is collect-in-graph + host-side replay.
    use_callback = config.get("LOG_VIA_CALLBACK", False)
    use_q_lambda = config.get("Q_LAMBDA", True)
    fast_targets = config.get("FAST_TARGETS", False)
    if fast_targets and config.get("NORM_TYPE") != "layer_norm":
        raise ValueError(
            "FAST_TARGETS requires NORM_TYPE=layer_norm (the out-of-grad "
            "target forward cannot replicate batch-stats mutation)"
        )
    use_fused_rollout = config.get("FUSED_ROLLOUT", False)
    if use_fused_rollout and (
        config["ENV_NAME"]
        not in (
            "Breakout-MinAtar", "Asterix-MinAtar", "Freeway-MinAtar",
            "SpaceInvaders-MinAtar", "Seaquest-MinAtar", "CartPole-v1",
        )
        or mode != "split"
        or config.get("NORM_TYPE") != "layer_norm"
        or config.get("NORM_INPUT", False)
        or (config["ENV_NAME"] == "CartPole-v1" and config.get("NUM_LAYERS", 2) != 2)
    ):
        raise ValueError(
            "FUSED_ROLLOUT supports all five MinAtar games and CartPole-v1 "
            "(2-layer MLP) with layer_norm, NORM_INPUT=False "
            "(ops/pallas_rollout.py)"
        )
    metric_callback = logger.make_callback() if logger is not None else None
    collect_metrics = config.get("COLLECT_METRICS", True)
    # FUSED_INTERPRET routes the fused kernels through the Pallas
    # interpreter (CPU-runnable, deterministic eps-greedy) — used by the
    # CPU-mesh SPMD tests and dryrun_multichip to exercise the fused path
    # without TPU hardware.
    fused_kw = (
        {"use_prng": False, "interpret": True}
        if config.get("FUSED_INTERPRET", False)
        else {}
    )

    def train(rng: jax.Array, runner_state=None):
        """Run NUM_UPDATES updates. With `runner_state` (from a previous
        invocation's outs["runner_state"]), training CONTINUES from that
        state instead of initializing — the fused-program continuation
        used by algo.segmented to split very long runs into bounded
        device-program executions (schedules key off the carried
        n_updates counter, so eps/LR trajectories are seamless)."""
        original_rng = rng[0]

        eps_scheduler = epsilon_schedule(
            config["EPS_START"],
            config["EPS_FINISH"],
            config["EPS_DECAY"] * config["NUM_UPDATES_DECAY"],
        )
        lr = lr_schedule(config)

        def create_agent(rng):
            init_x = jnp.zeros((1, *obs_shape))
            network_variables = network.init(rng, init_x, train=False)
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
            # Same params everywhere; distinct env/exploration streams.
            rng = jax.random.fold_in(rng, jax.lax.axis_index(pmap_axis))

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
            train_state, expl_state, test_metrics, rng = runner_state
            if shard_hint is not None:
                expl_state = shard_hint(expl_state)

            # ---- rollout ------------------------------------------------
            def _step_env(carry, _):
                last_obs, env_state, rng = carry
                rng, rng_a, rng_s = jax.random.split(rng, 3)
                q_vals = apply_eval(train_state, last_obs)
                eps = jnp.full(
                    config["NUM_ENVS"], eps_scheduler(train_state.n_updates)
                )
                new_action = eps_greedy_batch(rng_a, q_vals, eps)
                new_obs, new_env_state, reward, new_done, info = vmap_step(
                    rng_s, env_state, new_action
                )
                transition = Transition(
                    obs=last_obs,
                    action=new_action,
                    reward=rew_scale * reward,
                    done=new_done,
                    next_obs=new_obs,
                    q_val=q_vals,
                )
                return (new_obs, new_env_state, rng), (transition, info)

            if use_fused_rollout:
                # one Pallas kernel for the whole rollout (env + CNN +
                # eps-greedy in VMEM, hardware PRNG); Log-wrapper stats are
                # replayed from the (reward, done) streams afterwards —
                # see ops/pallas_rollout.py for the parity trade
                rng, _rng = jax.random.split(rng)
                seed = jax.random.randint(
                    _rng, (), 0, jnp.iinfo(jnp.int32).max
                )
                eps = eps_scheduler(train_state.n_updates)
                last_obs, log_state = expl_state
                T = config["NUM_STEPS"]
                (obs_seq, act, rew, done_i, q_seq, final_obs, new_env_state) = (
                    fused_game_rollout(
                        config["ENV_NAME"], seed, eps, train_state.params,
                        log_state.env_state, T, **fused_kw,
                    )
                )
                next_obs = jnp.concatenate([obs_seq[1:], final_obs[None]], 0)
                done = done_i.astype(bool)
                transitions = Transition(
                    obs=obs_seq,
                    action=act,
                    reward=rew_scale * rew,
                    done=done,
                    next_obs=next_obs,
                    q_val=q_seq[..., :action_dim],
                )

                def _log_replay(carry, rd):
                    ep_r, ep_l, ret_r, ret_l, ts = carry
                    r, dn = rd
                    ner, nel = ep_r + r, ep_l + 1
                    nd = (1 - dn).astype(ner.dtype)
                    nd_i = (1 - dn).astype(jnp.int32)
                    ret_r = ret_r * nd + ner * dn
                    ret_l = ret_l * nd_i + nel * dn.astype(jnp.int32)
                    ts = ts + 1
                    info = {
                        "returned_episode_returns": ret_r,
                        "returned_episode_lengths": ret_l,
                        "timestep": ts,
                        "returned_episode": dn.astype(bool),
                    }
                    return (ner * nd, nel * nd_i, ret_r, ret_l, ts), info

                log_carry = (
                    log_state.episode_returns,
                    log_state.episode_lengths,
                    log_state.returned_episode_returns,
                    log_state.returned_episode_lengths,
                    log_state.timestep,
                )
                (ep_r, ep_l, ret_r, ret_l, ts), infos = jax.lax.scan(
                    _log_replay, log_carry, (rew, done.astype(jnp.float32))
                )
                log_state = log_state.replace(
                    env_state=new_env_state,
                    episode_returns=ep_r,
                    episode_lengths=ep_l,
                    returned_episode_returns=ret_r,
                    returned_episode_lengths=ret_l,
                    timestep=ts,
                )
                expl_state = (final_obs, log_state)
            else:
                rng, _rng = jax.random.split(rng)
                (*expl_state, rng), (transitions, infos) = jax.lax.scan(
                    _step_env, (*expl_state, _rng), None, config["NUM_STEPS"]
                )
                expl_state = tuple(expl_state)

            train_state = train_state.replace(
                timesteps=train_state.timesteps
                + config["NUM_STEPS"] * config["NUM_ENVS"] * timestep_scale
            )

            # ---- lambda-return targets ---------------------------------
            if use_q_lambda:
                last_q = apply_eval(train_state, transitions.next_obs[-1])
                last_q = jnp.max(last_q, axis=-1)
                if config.get("PALLAS_RETURNS", False):
                    from purejaxql_tpu.ops.pallas_returns import (
                        lambda_returns_pallas,
                    )

                    lambda_targets = lambda_returns_pallas(
                        last_q,
                        transitions.reward,
                        transitions.done.astype(jnp.float32),
                        jnp.max(transitions.q_val, axis=-1),
                        config["GAMMA"],
                        config["LAMBDA"],
                    )
                else:
                    lambda_targets = lambda_returns(
                        last_q,
                        transitions.reward,
                        transitions.done,
                        jnp.max(transitions.q_val, axis=-1),
                        config["GAMMA"],
                        config["LAMBDA"],
                    )
            else:
                # 1-step TD recomputed per-minibatch inside the loss
                # (pqn_craftax.py:286-303); placeholder targets keep the
                # minibatch pipeline uniform.
                lambda_targets = transitions.reward

            # ---- epoch/minibatch SGD -----------------------------------
            def _learn_epoch(carry, _):
                train_state, rng = carry

                def _learn_phase(carry, minibatch_and_target):
                    train_state, rng = carry
                    minibatch, target = minibatch_and_target

                    if (not use_q_lambda) and fast_targets:
                        # FAST_TARGETS: the bootstrap Q(s') is a constant
                        # w.r.t. params (the reference stop_gradients it,
                        # pqn_craftax.py:292), so computing it OUTSIDE the
                        # grad closure skips the backward pass over the
                        # next_obs half of the concat batch — identical
                        # gradients for layer_norm trunks, ~1/3 less
                        # learn-phase compute. train=True so an input
                        # BatchNorm (NORM_INPUT) normalizes next_obs with
                        # its own fresh batch statistics like the concat
                        # formulation does — NOT warmup-biased running
                        # averages (measured on chip: train=False here
                        # costs real craftax learning); the stats
                        # mutation is discarded.
                        q_next_out, _discarded = network.apply(
                            {
                                "params": train_state.params,
                                "batch_stats": train_state.batch_stats,
                            },
                            minibatch.next_obs,
                            train=True,
                            mutable=["batch_stats"],
                        )
                        q_next_c = jnp.max(q_next_out, axis=-1)
                        fast_tgt = (
                            minibatch.reward
                            + (1 - minibatch.done)
                            * config["GAMMA"]
                            * q_next_c
                        )
                    else:
                        fast_tgt = None

                    def _loss_fn(params):
                        if (not use_q_lambda) and fast_targets:
                            q_vals, updates = network.apply(
                                {
                                    "params": params,
                                    "batch_stats": train_state.batch_stats,
                                },
                                minibatch.obs,
                                train=True,
                                mutable=["batch_stats"],
                            )
                            tgt = fast_tgt
                        elif use_q_lambda:
                            q_vals, updates = network.apply(
                                {
                                    "params": params,
                                    "batch_stats": train_state.batch_stats,
                                },
                                minibatch.obs,
                                train=True,
                                mutable=["batch_stats"],
                            )
                            tgt = target
                        else:
                            all_q_vals, updates = network.apply(
                                {
                                    "params": params,
                                    "batch_stats": train_state.batch_stats,
                                },
                                jnp.concatenate(
                                    (minibatch.obs, minibatch.next_obs)
                                ),
                                train=True,
                                mutable=["batch_stats"],
                            )
                            q_vals, q_next = jnp.split(all_q_vals, 2)
                            q_next = jnp.max(
                                jax.lax.stop_gradient(q_next), axis=-1
                            )
                            tgt = (
                                minibatch.reward
                                + (1 - minibatch.done) * config["GAMMA"] * q_next
                            )

                        chosen_action_qvals = jnp.take_along_axis(
                            q_vals,
                            jnp.expand_dims(minibatch.action, axis=-1),
                            axis=-1,
                        ).squeeze(axis=-1)
                        loss = 0.5 * jnp.square(chosen_action_qvals - tgt).mean()
                        return loss, (updates, chosen_action_qvals)

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

                # With ONE minibatch the shared-key permutation only
                # reorders rows within the single batch: gradients are
                # order-invariant up to float summation order, so the
                # fast path drops the ~8 per-leaf gather kernels (incl.
                # two obs-sized ones). RNG consumption is unchanged (the
                # split below still happens), so the random stream stays
                # identical; parity configs keep the gather for bitwise
                # reduction-order identity with pqn_gymnax.py:293-309.
                skip_noop_permute = config["NUM_MINIBATCHES"] == 1 and config.get(
                    "SKIP_NOOP_PERMUTE", fast_targets
                )

                def preprocess_transition(x, rng):
                    x = x.reshape(-1, *x.shape[2:])
                    if not skip_noop_permute:
                        x = jax.random.permutation(rng, x)
                    return x.reshape(config["NUM_MINIBATCHES"], -1, *x.shape[1:])

                rng, _rng = jax.random.split(rng)
                minibatches = jax.tree_util.tree_map(
                    lambda x: preprocess_transition(x, _rng), transitions
                )
                targets = jax.tree_util.tree_map(
                    lambda x: preprocess_transition(x, _rng), lambda_targets
                )

                rng, _rng = jax.random.split(rng)
                (train_state, rng), (loss, qvals) = jax.lax.scan(
                    _learn_phase, (train_state, rng), (minibatches, targets)
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
                # (pqn_craftax.py:364-369)
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
                log_interval = config.get("LOG_INTERVAL", 1)
                jax.lax.cond(
                    train_state.n_updates % log_interval == 0,
                    lambda: jax.debug.callback(
                        metric_callback, metrics, original_rng
                    ),
                    lambda: None,
                )

            runner_state = (train_state, tuple(expl_state), test_metrics, rng)
            out = metrics if collect_metrics else {}
            return runner_state, out

        def get_test_metrics(train_state, rng):
            if not config.get("TEST_DURING_TRAINING", False):
                return None

            if use_fused_rollout:
                # fused in-graph eval: the greedy (EPS_TEST) rollout runs
                # through the SAME Pallas kernels as training, scanned in
                # NUM_STEPS-sized chunks so the kernel instance is shared
                # shape-wise; episode stats replay from the (reward, done)
                # streams like the training Log replay above
                chunk = config["NUM_STEPS"]
                n_chunks = -(-config["TEST_NUM_STEPS"] // chunk)
                rng, _rng = jax.random.split(rng)
                _, test_log_state = test_reset(_rng)
                rng, _rng = jax.random.split(rng)
                seed0 = jax.random.randint(
                    _rng, (), 0, jnp.iinfo(jnp.int32).max - n_chunks * chunk
                )

                def _run_chunk(raw_state, i):
                    (_, _, rew, done_i, _, _, new_raw) = fused_game_rollout(
                        config["ENV_NAME"], seed0 + i * chunk,
                        jnp.float32(config["EPS_TEST"]),
                        train_state.params, raw_state, chunk, **fused_kw,
                    )
                    return new_raw, rew, done_i.astype(jnp.float32)

                if config.get("EVAL_EARLY_EXIT", False):
                    # stop once EVERY eval env has finished at least one
                    # episode (the AC reference's first-episode latch,
                    # pqn_mujoco_playground.py:716-726, applied at chunk
                    # granularity): unexecuted steps stay done=False so the
                    # episode-mean estimator sees exactly the episodes that
                    # completed before exit. Lane-padding makes fewer eval
                    # ENVS free-but-useless in the fused kernel — fewer
                    # eval STEPS is the axis that pays.
                    n_test = config["TEST_NUM_ENVS"]
                    buf_r = jnp.zeros((n_chunks, chunk, n_test))
                    buf_d = jnp.zeros((n_chunks, chunk, n_test))

                    def _cond(carry):
                        i, _, done_once, _, _ = carry
                        return (i < n_chunks) & ~done_once.all()

                    def _body(carry):
                        i, raw_state, done_once, buf_r, buf_d = carry
                        new_raw, rew, done_f = _run_chunk(raw_state, i)
                        buf_r = jax.lax.dynamic_update_slice(
                            buf_r, rew[None], (i, 0, 0)
                        )
                        buf_d = jax.lax.dynamic_update_slice(
                            buf_d, done_f[None], (i, 0, 0)
                        )
                        done_once = done_once | done_f.any(axis=0).astype(bool)
                        return (i + 1, new_raw, done_once, buf_r, buf_d)

                    (_, _, _, rews, dones) = jax.lax.while_loop(
                        _cond,
                        _body,
                        (
                            jnp.asarray(0, jnp.int32),
                            test_log_state.env_state,
                            jnp.zeros(n_test, bool),
                            buf_r,
                            buf_d,
                        ),
                    )
                else:
                    def _chunk(raw_state, i):
                        new_raw, rew, done_f = _run_chunk(raw_state, i)
                        return new_raw, (rew, done_f)

                    _, (rews, dones) = jax.lax.scan(
                        _chunk,
                        test_log_state.env_state,
                        jnp.arange(n_chunks),
                    )
                rews = rews.reshape(-1, rews.shape[-1])
                dones = dones.reshape(-1, dones.shape[-1])

                def _ep(carry, rd):
                    ep_r, ep_l = carry
                    r, dn = rd
                    ner, nel = ep_r + r, ep_l + 1
                    info = {
                        "returned_episode_returns": ner,
                        "returned_episode_lengths": nel.astype(jnp.float32),
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

            def _env_step(carry, _):
                env_state, last_obs, rng = carry
                rng, _rng = jax.random.split(rng)
                q_vals = apply_eval(train_state, last_obs)
                eps = jnp.full(config["TEST_NUM_ENVS"], config["EPS_TEST"])
                action = eps_greedy_batch(_rng, q_vals, eps)
                # NOTE: the reference reuses _rng for action sampling and
                # stepping here (pqn_gymnax.py:381-386); preserved for
                # parity.
                new_obs, new_env_state, reward, done, info = test_step(
                    _rng, env_state, action
                )
                return (new_env_state, new_obs, rng), info

            rng, _rng = jax.random.split(rng)
            init_obs, env_state = test_reset(_rng)
            _, infos = jax.lax.scan(
                _env_step,
                (env_state, init_obs, _rng),
                None,
                config["TEST_NUM_STEPS"],
            )
            return episode_mean_metrics(infos, pmap_axis)

        if runner_state is None:
            rng, _rng = jax.random.split(rng)
            test_metrics = get_test_metrics(train_state, _rng)

            rng, _rng = jax.random.split(rng)
            expl_state = vmap_reset(_rng)
            if shard_hint is not None:
                expl_state = shard_hint(expl_state)

            rng, _rng = jax.random.split(rng)
            runner_state = (train_state, expl_state, test_metrics, _rng)

        runner_state, metrics = jax.lax.scan(
            _update_step, runner_state, None, config["NUM_UPDATES"]
        )
        return {"runner_state": runner_state, "metrics": metrics}

    return train
