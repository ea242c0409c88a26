"""Sweep harness test (local random-search path, no wandb)."""

import json

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.utils.sweep import run_sweep


def test_local_random_sweep(capsys):
    config = compose(
        alg="pqn_cartpole",
        overrides=[
            "TOTAL_TIMESTEPS=8192", "TOTAL_TIMESTEPS_DECAY=8192",
            "NUM_ENVS=16", "NUM_STEPS=32", "NUM_MINIBATCHES=4",
            "NUM_EPOCHS=1", "HIDDEN_SIZE=32", "TEST_DURING_TRAINING=False",
            "SWEEP_COUNT=2",
        ],
    )
    config["SWEEP_SPACE"] = {"LR": [0.001, 0.0001]}
    result = run_sweep(config)
    assert result["best"] is not None
    assert result["best"]["LR"] in (0.001, 0.0001)
    out = capsys.readouterr().out
    assert json.loads(out.strip().splitlines()[-1])["best"] == result["best"]
