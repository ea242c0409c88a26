"""Where does the craftax-class update's time go on the real chip?

Times, separately jitted and warmed:
  step:     vmapped Forager step_env over NUM_ENVS
  reset:    vmapped Forager reset_env over NUM_ENVS/RESET_RATIO (worldgen)
  learn:    the Q-update (fwd+bwd through the 4x1024 MLP on the batch)
  update:   one full fused train update (scan body) for reference

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_craftax.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.envs import make

N_ENVS = 1024
N_RESETS = 64


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / reps
    print(f"{name:28s} {dt*1e3:8.3f} ms")
    return dt


def main():
    env, params = make("Craftax-Symbolic-v1")
    key = jax.random.PRNGKey(0)

    reset_keys = jax.random.split(key, N_RESETS)
    env_keys = jax.random.split(key, N_ENVS)

    v_reset = jax.jit(jax.vmap(env.reset_env, in_axes=(0, None)))
    obs, st64 = v_reset(reset_keys, params)
    # tile the 64 reset states up to 1024 envs
    idx = jnp.arange(N_ENVS) % N_RESETS
    state = jax.tree_util.tree_map(lambda x: x[idx], st64)
    n_act = env.action_space(params).n
    actions = jax.random.randint(key, (N_ENVS,), 0, n_act)

    v_step = jax.jit(jax.vmap(env.step_env, in_axes=(0, 0, 0, None)))

    t_reset = timeit("worldgen x64", v_reset, reset_keys, params)
    t_step = timeit("step_env x1024", v_step, env_keys, state, actions, params)

    # learn phase: same shapes as pqn_craftax (NUM_STEPS=1, 1024 envs)
    from purejaxql_tpu.algo.pqn import make_train

    config = compose(
        alg="pqn_craftax",
        overrides=[
            "TOTAL_TIMESTEPS=102400",
            "TOTAL_TIMESTEPS_DECAY=102400",
            "COLLECT_METRICS=False",
        ],
    )
    train = jax.jit(make_train(config))
    out = train(key)
    np.asarray(out["runner_state"][0].timesteps)
    t0 = time.time()
    out = train(key)
    np.asarray(out["runner_state"][0].timesteps)
    t_total = time.time() - t0
    n_updates = 102400 // N_ENVS
    t_update = t_total / n_updates
    print(f"{'full update (fused avg)':28s} {t_update*1e3:8.3f} ms")
    print(f"{'-> steps/s':28s} {N_ENVS/t_update:,.0f}")
    print(
        f"residual (learn+misc) = {1e3*(t_update - t_reset - t_step):.3f} ms"
    )


if __name__ == "__main__":
    main()
