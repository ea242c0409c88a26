"""Rollout/inference tool test: train via CLI, then roll out the saved
checkpoint through the tool's main()."""

import os

import numpy as np

from purejaxql_tpu.cli import main as cli_main
from purejaxql_tpu.scripts.rollout import main as rollout_main


def test_rollout_tool_end_to_end(tmp_path, capsys):
    rc = cli_main([
        "+alg=pqn_cartpole", f"SAVE_PATH={tmp_path}",
        "TOTAL_TIMESTEPS=16384", "TOTAL_TIMESTEPS_DECAY=16384",
        "NUM_ENVS=16", "NUM_STEPS=32", "NUM_MINIBATCHES=4", "NUM_EPOCHS=2",
        "HIDDEN_SIZE=32", "TEST_DURING_TRAINING=False",
    ])
    assert rc == 0

    traj_path = os.path.join(tmp_path, "traj.npz")
    rc = rollout_main([
        "--run-dir", str(tmp_path / "CartPole-v1"),
        "--episodes", "4",
        "--save-traj", traj_path,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "returns:" in out

    data = np.load(traj_path)
    assert data["obs"].shape[0] == 4
    assert data["returns"].shape == (4,)
    assert np.isfinite(data["returns"]).all()
    # a 16k-step agent beats pure random (~20) on average
    assert data["returns"].mean() > 9.0
