"""Measured engine-vs-engine comparison: purejaxql_tpu vs the UNMODIFIED
reference scripts, same config, same hardware (CPU), same env code.

The headline TPU bench (bench.py) compares against the reference's
qualitative A40 wall-times, which are guessed-from-prose numbers. This
script produces the measured-vs-measured companion: the reference's
pqn_gymnax.py / pqn_minatar.py run in-image through tests/refshim (gymnax
API backed by the in-tree envs — the same mechanism as the executed
bitwise-parity tests), so both engines train on identical env code,
config, and PRNGKey on the same CPU. Because trained params are
bit-identical (tests/test_parity_reference.py), any wall-time delta is
pure engine overhead: XLA program structure, not algorithm or env.

Writes docs/ENGINE_COMPARISON.json and prints a summary table.

Usage:  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/bench_engine_cpu.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from purejaxql_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

import jax
import numpy as np

from test_parity_reference import _import_reference, _parity_config  # noqa: E402

WORKLOADS = {
    # reference-config shapes, shortened totals so a CPU pass stays
    # manageable; both engines run the identical shortened config.
    "cartpole": dict(
        ref_module="purejaxql.pqn_gymnax",
        overrides=[
            "TOTAL_TIMESTEPS=200000",
            "TOTAL_TIMESTEPS_DECAY=200000",
        ],
        total=200000,
    ),
    "minatar_breakout": dict(
        ref_module="purejaxql.pqn_minatar",
        alg="pqn_minatar",
        overrides=[
            "ENV_NAME=Breakout-MinAtar",
            "TOTAL_TIMESTEPS=100000",
            "TOTAL_TIMESTEPS_DECAY=100000",
        ],
        total=100000,
    ),
}


def _time_train(train_fn, rngs, total, repeats=2):
    fn = jax.jit(jax.vmap(train_fn))
    outs = fn(rngs)
    jax.block_until_ready(outs)  # CPU backend: block works normally
    times = []
    for _ in range(repeats):
        t0 = time.time()
        outs = fn(rngs)
        jax.block_until_ready(outs)
        times.append(time.time() - t0)
    return total / min(times)


def bench_workload(name):
    spec = WORKLOADS[name]
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn import make_train as our_make_train

    if "alg" in spec:
        config = compose(alg=spec["alg"], overrides=spec["overrides"])
        ref_config = {
            **config,
            "WANDB_MODE": "disabled",
            "WANDB_LOG_ALL_SEEDS": False,
        }
    else:
        config, ref_config = _parity_config(spec["overrides"])

    rngs = jax.random.split(jax.random.PRNGKey(0), 1)
    ours = _time_train(our_make_train(dict(config)), rngs, spec["total"])
    ref_mod = _import_reference(spec["ref_module"])
    theirs = _time_train(
        ref_mod.make_train(dict(ref_config)), rngs, spec["total"]
    )
    return {
        "ours_steps_per_s": round(ours),
        "reference_steps_per_s": round(theirs),
        "speedup": round(ours / theirs, 3),
    }


def main():
    results = {
        "note": (
            "Same config, same seed, same in-tree env code, same CPU; "
            "reference scripts run unmodified via tests/refshim. Trained "
            "params are bit-identical (test_parity_reference.py), so the "
            "ratio isolates engine/XLA-program efficiency."
        ),
        "hardware": "CPU (JAX_PLATFORMS=cpu), single process",
        "workloads": {},
    }
    for name in WORKLOADS:
        r = bench_workload(name)
        results["workloads"][name] = r
        print(
            f"{name}: ours {r['ours_steps_per_s']:,} vs reference "
            f"{r['reference_steps_per_s']:,} steps/s  "
            f"({r['speedup']}x)",
            file=sys.stderr,
        )
    out_path = os.path.join(REPO, "docs", "ENGINE_COMPARISON.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["workloads"]))


if __name__ == "__main__":
    main()
