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


def test_rollout_tool_actor_critic_checkpoint(tmp_path, capsys):
    """AC checkpoints roll out through the deterministic-actor path with
    frozen obs-norm replay (the reference render script's
    InferenceModelState semantics)."""
    rc = cli_main([
        "+alg=pqn_dm_suite", "ENV_NAME=Pendulum-v1",
        f"SAVE_PATH={tmp_path}",
        "TOTAL_TIMESTEPS=4096", "NUM_ENVS=16", "NUM_STEPS=16",
        "NUM_MINIBATCHES=2", "NUM_EPOCHS=1",
        "ACTOR_HIDDEN_SIZES=[32,32]", "CRITIC_HIDDEN_SIZES=[32,32]",
        "TEST_DURING_TRAINING=False",
    ])
    assert rc == 0

    # the checkpoint carries actor+critic params AND the obs-norm stats
    from purejaxql_tpu.core.checkpoint import load_params
    import glob

    ckpt = glob.glob(str(tmp_path / "Pendulum-v1" / "*.safetensors"))[0]
    params = load_params(ckpt)
    assert "actor" in params and "critic" in params
    assert "norm_stats" in params, "NORMALIZE_OBS stats missing"
    assert np.isfinite(np.asarray(params["norm_stats"]["mean"])).all()

    traj_path = os.path.join(tmp_path, "ac_traj.npz")
    rc = rollout_main([
        "--run-dir", str(tmp_path / "Pendulum-v1"),
        "--episodes", "3",
        "--save-traj", traj_path,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "returns:" in out
    data = np.load(traj_path)
    assert data["returns"].shape == (3,)
    assert np.isfinite(data["returns"]).all()
    # pendulum returns are negative costs; sane range, not NaN garbage
    assert (data["returns"] < 0).all() and (data["returns"] > -2000).all()
