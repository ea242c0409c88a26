"""purejaxql-tpu: TPU-native PQN (Parallelised Q-Network) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mttga/purejaxql: fully-jitted on-device Q-learning with no replay buffer
and no target network, vectorized JAX environments stepping inside a
single lax.scan, Q(lambda) returns by reverse scan, normalized Q-networks
updated online, seed-parallelism via vmap, and env/learner sharding over
TPU meshes.

Quick start:

    import jax
    from purejaxql_tpu import compose, make_train

    config = compose(alg="pqn_cartpole")
    rngs = jax.random.split(jax.random.PRNGKey(0), config["NUM_SEEDS"])
    outs = jax.jit(jax.vmap(make_train(config)))(rngs)

Algorithm families: `algo.pqn` (feedforward), `algo.pqn_rnn` (recurrent),
`algo.pqn_vdn` (cooperative multi-agent), `algo.pqn_ac` (continuous
control), `algo.pqn_host` (C++ host envs). Staged API: `algo.stages`.
Sharding: `parallel.mesh` / `parallel.spmd`.
"""

__version__ = "0.1.0"

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.algo.pqn import make_train

__all__ = ["compose", "make_train", "__version__"]
