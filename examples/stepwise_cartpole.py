"""Staged-API example: host-loop training with per-update control.

The stages (rollout / compute_targets / learn / evaluate) are separately
jittable, so you can interleave custom logic — logging, curriculum,
checkpointing — between updates at the cost of per-stage dispatch.
For maximum throughput use the fused trainer instead (algo.pqn.make_train).
"""

import jax

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.algo.stages import make_stages

config = compose(
    alg="pqn_cartpole",
    overrides=["TOTAL_TIMESTEPS=100000", "TOTAL_TIMESTEPS_DECAY=100000"],
)
stages = make_stages(config)

rng = jax.random.PRNGKey(0)
rng, k_init, k_reset = jax.random.split(rng, 3)
train_state = stages.init_agent(k_init)
obs, env_state = stages.reset(k_reset)

for update in range(stages.config["NUM_UPDATES"]):
    rng, k_roll, k_learn = jax.random.split(rng, 3)
    obs, env_state, transitions, infos = stages.rollout(
        train_state, obs, env_state, k_roll
    )
    targets = stages.compute_targets(train_state, transitions)
    train_state, loss, qvals = stages.learn(
        train_state, transitions, targets, k_learn
    )
    if update % 10 == 0:
        ret = float(infos["returned_episode_returns"].mean())
        print(f"update {update:4d}  loss {float(loss):8.4f}  return {ret:7.2f}")

rng, k_eval = jax.random.split(rng)
print("final eval:", {k: float(v) for k, v in stages.evaluate(train_state, k_eval).items()})
