"""purejaxql-tpu: TPU-native PQN (Parallelised Q-Network) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mttga/purejaxql: fully-jitted on-device Q-learning with no replay buffer and
no target network, vectorized JAX environments stepping inside a single
lax.scan, Q(lambda) returns by reverse scan, normalized Q-networks updated
online, seed-parallelism via vmap, and (new here) env/learner sharding over
TPU meshes.
"""

__version__ = "0.1.0"
