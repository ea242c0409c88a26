"""CLI tests driving main() in-process."""

import json
import os

import numpy as np
import pytest

from purejaxql_tpu.cli import main


BASE = [
    "TOTAL_TIMESTEPS=8192", "TOTAL_TIMESTEPS_DECAY=8192", "NUM_ENVS=16",
    "NUM_STEPS=32", "NUM_MINIBATCHES=4", "NUM_EPOCHS=1", "HIDDEN_SIZE=32",
    "TEST_DURING_TRAINING=False",
]


def test_cli_trains_and_saves(tmp_path):
    rc = main(["+alg=pqn_cartpole", f"SAVE_PATH={tmp_path}",
               f"LOG_JSONL={tmp_path}/m.jsonl"] + BASE)
    assert rc == 0
    files = os.listdir(tmp_path / "CartPole-v1")
    assert any(f.endswith(".safetensors") for f in files)
    assert any(f.endswith("_config.yaml") for f in files)
    rows = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert rows and "td_loss" in rows[-1]


def test_cli_unknown_alg():
    with pytest.raises(ValueError, match="Unknown algorithm config"):
        main(["+alg=does_not_exist"])


def test_cli_no_alg():
    with pytest.raises(SystemExit, match="No algorithm selected"):
        main([])


def test_cli_rnn_dispatch(tmp_path):
    rc = main(["+alg=pqn_rnn_cartpole", f"SAVE_PATH={tmp_path}",
               "MEMORY_WINDOW=2"] + BASE)
    assert rc == 0


def test_cli_host_dispatch(tmp_path):
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("no native toolchain")
    rc = main(["+alg=pqn_cartpole", "ALG_NAME=pqn_host",
               f"SAVE_PATH={tmp_path}"] + BASE)
    assert rc == 0
