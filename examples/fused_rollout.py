"""Opt-in fused-rollout fast path: the whole rollout as one TPU kernel.

Any MinAtar game or CartPole can run its entire NUM_STEPS rollout — env
dynamics, network forward, eps-greedy exploration, auto-resets — inside a
single Pallas kernel per update (ops/pallas_rollout.py). Measured on one
v5e chip at the reference configs: Asterix 2.33x end-to-end, Seaquest
3.28x (569k vs 174k), SpaceInvaders +53%, Freeway +35%; with the fused
in-graph eval, Breakout reaches 1.19M and CartPole 1.25M env-steps/s
(~3x their parity rows). Learning is verified per game (e.g. fused
Seaquest 0.02 -> 10.0 test return at 2M steps).

The trade: exploration/reset randomness comes from the TPU's hardware
PRNG instead of the reference's threefry split discipline — same
statistics, different stream — so bitwise trajectory parity is not
preserved on this path (the default path keeps it).

Run (on a TPU):
    python examples/fused_rollout.py
"""

import time

import jax
import numpy as np

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.algo.pqn import make_train


def main():
    config = compose(
        alg="pqn_minatar",
        overrides=[
            "TOTAL_TIMESTEPS=2000000",
            "TOTAL_TIMESTEPS_DECAY=2000000",
            "FUSED_ROLLOUT=True",
        ],
    )
    train = jax.jit(make_train(config))
    t0 = time.time()
    outs = train(jax.random.PRNGKey(0))
    rets = np.asarray(outs["metrics"]["test/returned_episode_returns"])
    print(f"trained 2M steps in {time.time() - t0:.1f}s "
          f"(first run includes compile)")
    print("greedy test returns over training:", rets[:: max(1, len(rets) // 8)])


if __name__ == "__main__":
    main()
