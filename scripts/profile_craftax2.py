"""Craftax update-time ablations, all measured as full fused train scans
(standalone dispatches on the tunneled runtime pay ~20ms fixed overhead,
so only in-scan numbers mean anything).

Rows:
  base:        pqn_craftax as shipped (1024 envs, ratio 16 = 64 worldgen/step)
  ratio1024:   1 worldgen/step  -> isolates the worldgen share
  tiny_net:    HIDDEN_SIZE=64   -> isolates the learn+forward share
  ns8:         NUM_STEPS=8      -> amortized learn phase (8x bigger batch)
  ns8_ratio1024: both

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_craftax2.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.algo.pqn import make_train

TOTAL = 1024 * 200  # 200 updates at NUM_STEPS=1

ROWS = {
    "base": [],
    "ratio1024": ["OPTIMISTIC_RESET_RATIO=1024"],
    "tiny_net": ["HIDDEN_SIZE=64"],
    "ns8": ["NUM_STEPS=8"],
    "ns8_ratio1024": ["NUM_STEPS=8", "OPTIMISTIC_RESET_RATIO=1024"],
    "ns32_ratio1024": ["NUM_STEPS=32", "OPTIMISTIC_RESET_RATIO=1024"],
}


def main():
    key = jax.random.PRNGKey(0)
    for name, extra in ROWS.items():
        config = compose(
            alg="pqn_craftax",
            overrides=[
                f"TOTAL_TIMESTEPS={TOTAL}",
                f"TOTAL_TIMESTEPS_DECAY={TOTAL}",
                "COLLECT_METRICS=False",
            ]
            + extra,
        )
        train = jax.jit(make_train(config))
        out = train(key)
        np.asarray(out["runner_state"][0].timesteps)
        times = []
        for _ in range(3):
            t0 = time.time()
            out = train(key)
            np.asarray(out["runner_state"][0].timesteps)
            times.append(time.time() - t0)
        dt = min(times)
        print(f"{name:16s} {dt:7.3f} s   {TOTAL/dt:>10,.0f} steps/s")


if __name__ == "__main__":
    main()
