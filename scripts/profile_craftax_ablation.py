"""Where does craftax_fast time go? Ablation timings on the real chip:
stub out one component at a time (obs build, env dynamics, the learn
phase) and compare end-to-end wall time at the bench config. Evidence for
the per-env-VPU-bound ceiling analysis (ROADMAP round-3/4 notes)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.envs.gridworld import forager as fg

TOTAL = 1024000


def timeit(tag):
    from purejaxql_tpu.algo.pqn import make_train

    config = compose(
        alg="pqn_craftax",
        overrides=[
            f"TOTAL_TIMESTEPS={TOTAL}",
            f"TOTAL_TIMESTEPS_DECAY={TOTAL}",
            "COLLECT_METRICS=False",
            "RESET_BANK=256",
            "FAST_TARGETS=True",
        ],
    )
    fn = jax.jit(jax.vmap(make_train(dict(config))))
    rngs = jax.random.split(jax.random.PRNGKey(0), 1)
    out = fn(rngs)
    np.asarray(out["runner_state"][0].timesteps)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(rngs)
        np.asarray(out["runner_state"][0].timesteps)
        ts.append(time.perf_counter() - t0)
    print(
        f"{tag}: {min(ts)*1e3:.0f} ms ({TOTAL/min(ts)/1e3:.0f}k steps/s)",
        flush=True,
    )
    return min(ts)


base = timeit("baseline")

# --- obs build stubbed (same shape, trivial content) ---------------------
real_get_obs = fg.Forager.get_obs
fg.Forager.get_obs = lambda self, state, params: jnp.zeros(
    fg.OBS_DIM, jnp.float32
)
no_obs = timeit("obs-build stubbed")
fg.Forager.get_obs = real_get_obs

# --- env dynamics stubbed (time/terminal bookkeeping only) ---------------
real_step = fg.Forager.step_env


def _fake_step(self, key, state, action, params):
    new_state = state.replace(time=state.time + 1)
    done = new_state.time >= params.max_steps_in_episode
    return (
        self.get_obs(new_state, params),
        new_state,
        jnp.asarray(0.0, jnp.float32),
        done,
        {"achievement_count": jnp.asarray(0.0)},
    )


fg.Forager.step_env = _fake_step
no_dyn = timeit("dynamics stubbed (obs build kept)")
fg.Forager.step_env = real_step

print(f"obs-build share:  {(base-no_obs)*1e3:.0f} ms")
print(f"dynamics share:   {(base-no_dyn)*1e3:.0f} ms")
print(f"residual (learn+serve+log): {(base-(base-no_obs)-(base-no_dyn))*1e3:.0f} ms")
