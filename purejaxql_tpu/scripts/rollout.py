"""Policy rollout / inference tool: load a trained checkpoint, roll out the
greedy policy, report episode statistics, and capture trajectories.

The framework's counterpart of the reference's render script
(/root/reference/scripts/mujoco_playground_render.py): loads
safetensors + config saved by the CLI, reconstructs the network, runs
greedy episodes under jit, and (optionally) saves the trajectory as .npz
and renders gridworld/MinAtar frames as ASCII or an animated GIF (the
dependency-free analogue of the reference's MP4 output).

    python -m purejaxql_tpu.scripts.rollout \
        --run-dir models/CartPole-v1 --episodes 8 --save-traj /tmp/traj.npz
    python -m purejaxql_tpu.scripts.rollout \
        --run-dir models/Breakout-MinAtar --gif /tmp/breakout.gif
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.core.checkpoint import load_params
from purejaxql_tpu.core.config import load_yaml
from purejaxql_tpu.envs import make as make_env
from purejaxql_tpu.envs import wrappers
from purejaxql_tpu.models.factory import make_q_network


def find_run_files(run_dir: str):
    configs = sorted(glob.glob(os.path.join(run_dir, "*_config.yaml")))
    params_files = sorted(
        f
        for f in glob.glob(os.path.join(run_dir, "*.safetensors"))
    )
    if not configs or not params_files:
        raise SystemExit(
            f"No run files in {run_dir} (need *_config.yaml + *.safetensors)"
        )
    return configs[0], params_files[0]


def greedy_rollout(config, params, batch_stats, num_episodes, seed, max_steps):
    env, env_params = make_env(config["ENV_NAME"], **(config.get("ENV_KWARGS") or {}))
    obs_shape = env.observation_space(env_params).shape
    flatten = len(obs_shape) == 1 or config.get("ARCH") == "mlp"
    if flatten and len(obs_shape) > 1:
        env = wrappers.FlattenObservation(env)
    env = wrappers.Log(env)
    obs_shape = env.observation_space(env_params).shape
    action_dim = env.action_space(env_params).n
    network = make_q_network(config, action_dim, obs_shape)
    variables = {"params": params, "batch_stats": batch_stats}

    def episode(rng):
        obs, state = env.reset(rng, env_params)

        def step(carry, _):
            obs, state, rng, done_seen, ep_ret, ep_len = carry
            rng, k = jax.random.split(rng)
            q = network.apply(variables, obs[None], train=False)[0]
            action = jnp.argmax(q)
            next_obs, next_state, reward, done, info = env.step(
                k, state, action, env_params
            )
            first_done = jnp.logical_and(done, jnp.logical_not(done_seen))
            ep_ret = jnp.where(
                first_done, info["returned_episode_returns"], ep_ret
            )
            ep_len = jnp.where(
                first_done, info["returned_episode_lengths"], ep_len
            )
            done_seen = jnp.logical_or(done_seen, done)
            return (next_obs, next_state, rng, done_seen, ep_ret, ep_len), (
                obs,
                action,
                reward,
            )

        (_, _, _, done_seen, ep_ret, ep_len), traj = jax.lax.scan(
            step,
            (obs, state, rng, jnp.asarray(False), 0.0, jnp.asarray(0, jnp.int32)),
            None,
            max_steps,
        )
        return ep_ret, ep_len, traj

    rngs = jax.random.split(jax.random.PRNGKey(seed), num_episodes)
    rets, lens, trajs = jax.vmap(episode)(rngs)
    return np.asarray(rets), np.asarray(lens), jax.tree_util.tree_map(np.asarray, trajs)


def greedy_rollout_ac(config, params, num_episodes, seed, max_steps):
    """Inference for actor-critic checkpoints: deterministic tanh-actor
    rollout with frozen obs-normalization replay — the reference render
    path's InferenceModelState semantics
    (mujoco_playground_render.py:39-53, 110-123)."""
    from purejaxql_tpu.models.actor_critic import Actor

    env, env_params = make_env(
        config["ENV_NAME"], **(config.get("ENV_KWARGS") or {})
    )
    env = wrappers.Log(env)
    aspace = env.action_space(env_params)
    low = jnp.asarray(aspace.low, jnp.float32)
    high = jnp.asarray(aspace.high, jnp.float32)
    action_dim = aspace.shape[0]
    obs_shape = env.observation_space(env_params).shape

    actor = Actor(
        action_dim,
        action_scale=jnp.asarray((high - low) / 2.0).reshape(-1)[0],
        action_bias=jnp.asarray((high + low) / 2.0).reshape(-1)[0],
        hidden_sizes=tuple(config["ACTOR_HIDDEN_SIZES"]),
        activation=config.get("ACTIVATION", "relu"),
        norm_type=config["NORM_TYPE"],
        init_scale=config.get("ACTOR_INIT_SCALE", 1.0),
    )
    init_vars = actor.init(jax.random.PRNGKey(0), jnp.zeros((1, *obs_shape)))
    variables = {
        "params": params["actor"],
        "batch_stats": init_vars["batch_stats"],
    }
    norm = params.get("norm_stats")
    if norm is not None:
        n_mean = jnp.asarray(norm["mean"])
        n_var = jnp.asarray(norm["var"])

    def normalize(obs):
        if norm is None:
            return obs
        return (obs - n_mean) / jnp.sqrt(n_var + 1e-8)

    def episode(rng):
        obs, state = env.reset(rng, env_params)

        def step(carry, _):
            obs, state, rng, done_seen, ep_ret, ep_len = carry
            rng, k = jax.random.split(rng)
            action = actor.apply(
                variables, normalize(obs)[None], train=False
            )[0]
            action = jnp.clip(action, low, high)
            next_obs, next_state, reward, done, info = env.step(
                k, state, action, env_params
            )
            first_done = jnp.logical_and(done, jnp.logical_not(done_seen))
            ep_ret = jnp.where(
                first_done, info["returned_episode_returns"], ep_ret
            )
            ep_len = jnp.where(
                first_done, info["returned_episode_lengths"], ep_len
            )
            done_seen = jnp.logical_or(done_seen, done)
            return (next_obs, next_state, rng, done_seen, ep_ret, ep_len), (
                obs,
                action,
                reward,
            )

        (_, _, _, _, ep_ret, ep_len), traj = jax.lax.scan(
            step,
            (obs, state, rng, jnp.asarray(False), 0.0, jnp.asarray(0, jnp.int32)),
            None,
            max_steps,
        )
        return ep_ret, ep_len, traj

    rngs = jax.random.split(jax.random.PRNGKey(seed), num_episodes)
    rets, lens, trajs = jax.vmap(episode)(rngs)
    return np.asarray(rets), np.asarray(lens), jax.tree_util.tree_map(np.asarray, trajs)


def ascii_render_minatar(obs_frame: np.ndarray) -> str:
    """Render a (10, 10, C) MinAtar frame as one character per cell."""
    symbols = "#@*o+x$%"
    grid = [["." for _ in range(obs_frame.shape[1])] for _ in range(obs_frame.shape[0])]
    for c in range(obs_frame.shape[2]):
        for y in range(obs_frame.shape[0]):
            for x in range(obs_frame.shape[1]):
                if obs_frame[y, x, c] > 0.5:
                    grid[y][x] = symbols[c % len(symbols)]
    return "\n".join("".join(row) for row in grid)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-dir", required=True)
    p.add_argument("--episodes", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--save-traj", default=None)
    p.add_argument("--ascii", action="store_true", help="print first-episode frames")
    p.add_argument(
        "--gif",
        default=None,
        help="write the first episode as an animated GIF (grid-obs envs only)",
    )
    p.add_argument("--gif-scale", type=int, default=8, help="pixels per grid cell")
    args = p.parse_args(argv)

    config_path, params_path = find_run_files(args.run_dir)
    config = load_yaml(config_path)
    params = load_params(params_path)
    env, env_params = make_env(config["ENV_NAME"], **(config.get("ENV_KWARGS") or {}))

    if isinstance(params, dict) and "actor" in params:
        # actor-critic checkpoint (continuous control): deterministic
        # actor + frozen obs-norm replay
        max_steps = args.max_steps or getattr(
            env_params, "max_steps_in_episode", 1000
        )
        rets, lens, trajs = greedy_rollout_ac(
            config, params, args.episodes, args.seed, max_steps
        )
        print(f"episodes: {args.episodes}")
        print(
            f"returns:  mean {rets.mean():.2f}  min {rets.min():.2f}  "
            f"max {rets.max():.2f}"
        )
        print(f"lengths:  mean {lens.mean():.1f}")
        if args.save_traj:
            np.savez_compressed(
                args.save_traj,
                obs=trajs[0], actions=trajs[1], rewards=trajs[2],
                returns=rets, lengths=lens,
            )
            print(f"trajectory saved to {args.save_traj}")
        return 0

    # inference-grade checkpoints carry params only; batch_stats are
    # reconstructed at init scale (exact for layer_norm configs)
    obs_shape = env.observation_space(env_params).shape
    if len(obs_shape) > 1 and config.get("ARCH", "mlp" if len(obs_shape) == 1 else "cnn") == "mlp":
        obs_shape = (int(np.prod(obs_shape)),)
    network = make_q_network(config, env.action_space(env_params).n, obs_shape)
    init_vars = network.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *obs_shape)), train=False
    )
    batch_stats = init_vars["batch_stats"]

    max_steps = args.max_steps or getattr(env_params, "max_steps_in_episode", 1000)
    rets, lens, trajs = greedy_rollout(
        config, params, batch_stats, args.episodes, args.seed, max_steps
    )
    print(f"episodes: {args.episodes}")
    print(f"returns:  mean {rets.mean():.2f}  min {rets.min():.2f}  max {rets.max():.2f}")
    print(f"lengths:  mean {lens.mean():.1f}")

    if args.save_traj:
        np.savez_compressed(
            args.save_traj,
            obs=trajs[0],
            actions=trajs[1],
            rewards=trajs[2],
            returns=rets,
            lengths=lens,
        )
        print(f"trajectory saved to {args.save_traj}")

    if args.ascii:
        obs = trajs[0][0]
        for t in range(0, min(10, obs.shape[0])):
            frame = obs[t]
            if frame.ndim == 3:
                print(f"--- t={t}")
                print(ascii_render_minatar(frame))

    if args.gif:
        obs = trajs[0][0]  # first episode, (T, ...) obs
        if obs.ndim == 2 and config["ENV_NAME"] in (
            "Forager-v0", "Craftax-Symbolic-v1"
        ):
            # Forager obs are flat symbolic vectors whose leading
            # VIEW*VIEW*(blocks+mobs) entries are the one-hot local view —
            # reshape that back into (T, VIEW, VIEW, C) frames
            from purejaxql_tpu.envs.gridworld import forager as _F
            from purejaxql_tpu.envs.gridworld import worldgen as _W

            c = _W.NUM_BLOCK_TYPES + _F.NUM_MOB_TYPES
            grid = obs[:, : _F.VIEW * _F.VIEW * c]
            obs = grid.reshape(obs.shape[0], _F.VIEW, _F.VIEW, c)
        if obs.ndim != 4:
            raise SystemExit(
                "--gif needs (T, H, W, C) grid observations; "
                f"got trajectory obs of shape {obs.shape}. "
                "Train a gridworld/MinAtar checkpoint, or use --save-traj."
            )
        # stop at the first episode boundary so the GIF is one episode
        ep_len = int(lens[0]) if lens[0] > 0 else obs.shape[0]
        from purejaxql_tpu.utils.gif import render_grid_episode_gif

        render_grid_episode_gif(
            args.gif, obs[: max(ep_len, 1)], scale=args.gif_scale
        )
        print(f"gif saved to {args.gif} ({max(ep_len, 1)} frames)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
