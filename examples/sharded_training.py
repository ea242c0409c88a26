"""SPMD example: envs sharded over a device mesh, learner in lockstep.

Run on any device count; for a CPU test mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_training.py
"""

from purejaxql_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import numpy as np

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.parallel.mesh import init_distributed, make_mesh
from purejaxql_tpu.parallel.spmd import make_train_spmd

init_distributed()
n = len(jax.devices())
print(f"{n} devices")

config = compose(
    alg="pqn_cartpole",
    overrides=[
        f"NUM_ENVS={32 * n}",           # global env count
        f"TOTAL_TIMESTEPS={65536 * n}",
        f"TOTAL_TIMESTEPS_DECAY={65536 * n}",
        "TEST_DURING_TRAINING=False",
    ],
)
mesh = make_mesh(env=n)
train = make_train_spmd(config, mesh)
out = train(jax.random.PRNGKey(0))
print("global env steps:", int(np.asarray(out["train_state"].timesteps)))
print("final mean return:",
      float(np.asarray(out["metrics"]["returned_episode_returns"])[-1]))
