"""Measure the REFERENCE engine's training throughput on this chip.

The refshim (tests/refshim) lets the unmodified reference scripts
(pqn_gymnax.py / pqn_minatar.py / pqn_craftax.py / pqn_rnn_gymnax.py /
pqn_rnn_craftax.py / pqn_vdn_rnn_jaxmarl.py) build their train fns against
the in-tree envs. Running them here, at the SAME configs bench.py uses, on
the SAME hardware, turns bench.py's `vs_baseline` from a prose-derived
guess (README wall-times on an A40) into a measured same-chip
engine-vs-engine ratio.

Writes docs/REFERENCE_ONCHIP.json: {row: {"ref_sps": .., "config": ..,
"platform": ..}}. bench.py reads it for the measured denominators;
docs/ENGINE_COMPARISON.json (CPU) remains the CPU-backend counterpart.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_reference.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache")
)
sys.path.insert(0, REPO)
REFERENCE = "/root/reference"
REFSHIM = os.path.join(REPO, "tests", "refshim")
for p in (REFERENCE, REFSHIM):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax
import numpy as np

from purejaxql_tpu.core.config import compose

# (bench row, reference module, our alg config, overrides, total steps)
ROWS = [
    (
        "cartpole_parity",
        "purejaxql.pqn_gymnax",
        "pqn_cartpole",
        ["COLLECT_METRICS=False"],
        int(5e5),
    ),
    (
        "minatar_parity",
        "purejaxql.pqn_minatar",
        "pqn_minatar",
        [
            "ENV_NAME=Breakout-MinAtar",
            "TOTAL_TIMESTEPS=2000000",
            "TOTAL_TIMESTEPS_DECAY=2000000",
            "COLLECT_METRICS=False",
        ],
        int(2e6),
    ),
    (
        "craftax",
        "purejaxql.pqn_craftax",
        "pqn_craftax",
        [
            "TOTAL_TIMESTEPS=1024000",
            "TOTAL_TIMESTEPS_DECAY=1024000",
            "COLLECT_METRICS=False",
        ],
        int(1024000),
    ),
    (
        "rnn_cartpole",
        "purejaxql.pqn_rnn_gymnax",
        "pqn_rnn_cartpole",
        ["COLLECT_METRICS=False", "TEST_DURING_TRAINING=False"],
        int(5e5),
    ),
    (
        "vdn_spread",
        "purejaxql.pqn_vdn_rnn_jaxmarl",
        "pqn_vdn_spread",
        ["COLLECT_METRICS=False", "TEST_DURING_TRAINING=False"],
        int(1e6),
    ),
    (
        "rnn_craftax",
        "purejaxql.pqn_rnn_craftax",
        "pqn_rnn_craftax",
        [
            "TOTAL_TIMESTEPS=2621440",  # 20 updates at 1024x128
            "TOTAL_TIMESTEPS_DECAY=1000000000",
            "COLLECT_METRICS=False",
            "TEST_DURING_TRAINING=False",
        ],
        int(2621440),
    ),
]


def measure(row, module, alg, overrides, total):
    import importlib

    config = compose(alg=alg, overrides=overrides)
    ref_config = {
        **config,
        "WANDB_MODE": "disabled",
        "WANDB_LOG_ALL_SEEDS": False,
        "RETURN_METRICS": False,
    }
    # yaml "5e5"-style scalars arrive as strings; the reference scripts
    # use them numerically without coercion
    for k in ("TOTAL_TIMESTEPS", "TOTAL_TIMESTEPS_DECAY"):
        if k in ref_config:
            ref_config[k] = int(float(ref_config[k]))
    mod = importlib.import_module(module)
    if row == "vdn_spread":
        import copy

        ref_config["ENV_NAME"] = "MPE_simple_spread_v3"
        env, _ = mod.env_from_config(copy.deepcopy(ref_config))
        train = mod.make_train(dict(ref_config), env)
    else:
        train = mod.make_train(dict(ref_config))
    fn = jax.jit(jax.vmap(train))
    rngs = jax.random.split(jax.random.PRNGKey(0), 1)
    out = fn(rngs)
    np.asarray(jax.tree_util.tree_leaves(out["runner_state"][0].params)[0])
    times = []
    for _ in range(3):
        t0 = time.time()
        out = fn(rngs)
        np.asarray(
            jax.tree_util.tree_leaves(out["runner_state"][0].params)[0]
        )
        times.append(time.time() - t0)
    return total / min(times)


def main():
    out_path = os.path.join(REPO, "docs", "REFERENCE_ONCHIP.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    platform = jax.devices()[0].platform
    only = sys.argv[1:] or None
    for row, module, alg, overrides, total in ROWS:
        if only and row not in only:
            continue
        try:
            sps = measure(row, module, alg, overrides, total)
            results[row] = {
                "ref_sps": sps,
                "alg": alg,
                "overrides": overrides,
                "platform": platform,
            }
            print(f"{row}: reference engine {sps/1e3:.1f}k steps/s", flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue
            print(f"{row}: FAILED {type(e).__name__}: {e}", flush=True)
            results[row] = {"error": f"{type(e).__name__}: {e}"}
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
