"""GIF policy-video renderer tests.

The reference renders MP4 policy videos (scripts/mujoco_playground_render.py:
274-308); purejaxql_tpu renders grid-obs episodes as animated GIFs with a
dependency-free encoder (purejaxql_tpu/utils/gif.py). These tests round-trip
the encoder output through PIL (available in this image, test-only dep) and
drive the rollout tool's --gif path end-to-end on a MinAtar checkpoint.
"""

import numpy as np
import pytest

from purejaxql_tpu.utils.gif import (
    grid_obs_to_indexed,
    palette_for_channels,
    render_grid_episode_gif,
    write_gif,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def test_write_gif_roundtrip_pixels(tmp_path):
    # 3 frames, 4x5, moving dot on channel-1 color (palette index 2)
    frames = []
    for t in range(3):
        f = np.zeros((4, 5), np.uint8)
        f[1, t] = 2
        f[3, 4] = 1
        frames.append(f)
    palette = palette_for_channels(3)
    path = str(tmp_path / "t.gif")
    write_gif(path, frames, palette, delay_cs=5)

    im = Image.open(path)
    assert im.format == "GIF"
    assert im.size == (5, 4)  # (W, H)
    assert getattr(im, "n_frames", 1) == 3
    for t in range(3):
        im.seek(t)
        rgb = np.asarray(im.convert("RGB"))
        assert tuple(rgb[1, t]) == palette[2]
        assert tuple(rgb[3, 4]) == palette[1]
        assert tuple(rgb[0, 0]) == palette[0]  # background


def test_write_gif_many_colors(tmp_path):
    # force a palette > 4 entries so the LZW code width budget logic runs
    H, W = 16, 16
    frames = [
        (np.arange(H * W, dtype=np.uint8).reshape(H, W) % 11) for _ in range(2)
    ]
    palette = palette_for_channels(10)
    path = str(tmp_path / "wide.gif")
    write_gif(path, frames, palette, delay_cs=3)
    im = Image.open(path)
    assert im.n_frames == 2
    im.seek(1)
    rgb = np.asarray(im.convert("RGB"))
    idx = frames[1]
    for y in (0, 7, 15):
        for x in (0, 8, 15):
            assert tuple(rgb[y, x]) == palette[idx[y, x]]


def test_grid_obs_to_indexed_priority_and_scale():
    obs = np.zeros((2, 2, 3), np.float32)
    obs[0, 0, 2] = 1.0
    obs[0, 0, 0] = 1.0  # lowest-index active channel wins
    obs[1, 1, 1] = 1.0
    idx = grid_obs_to_indexed(obs, scale=3)
    assert idx.shape == (6, 6)
    assert idx[0, 0] == 1  # channel 0 + 1
    assert idx[5, 5] == 2  # channel 1 + 1
    assert idx[0, 5] == 0  # background
    # every pixel in a scaled cell identical
    assert (idx[:3, :3] == 1).all()


def test_render_grid_episode_gif(tmp_path):
    T, H, W, C = 6, 10, 10, 4
    rng = np.random.default_rng(0)
    obs = (rng.random((T, H, W, C)) > 0.8).astype(np.float32)
    path = str(tmp_path / "ep.gif")
    render_grid_episode_gif(path, obs, scale=4)
    im = Image.open(path)
    assert im.size == (40, 40)
    assert im.n_frames == T


def test_rollout_tool_gif(tmp_path, capsys):
    from purejaxql_tpu.cli import main as cli_main
    from purejaxql_tpu.scripts.rollout import main as rollout_main

    rc = cli_main([
        "+alg=pqn_minatar", "ENV_NAME=Breakout-MinAtar", f"SAVE_PATH={tmp_path}",
        "TOTAL_TIMESTEPS=2048", "TOTAL_TIMESTEPS_DECAY=2048",
        "NUM_ENVS=8", "NUM_STEPS=16", "NUM_MINIBATCHES=2", "NUM_EPOCHS=1",
        "TEST_DURING_TRAINING=False",
    ])
    assert rc == 0
    gif_path = str(tmp_path / "ep.gif")
    rc = rollout_main([
        "--run-dir", str(tmp_path / "Breakout-MinAtar"),
        "--episodes", "2", "--max-steps", "64",
        "--gif", gif_path, "--gif-scale", "4",
    ])
    assert rc == 0
    assert "gif saved" in capsys.readouterr().out
    im = Image.open(gif_path)
    assert im.format == "GIF"
    assert im.size == (40, 40)  # 10x10 MinAtar grid at scale 4
    assert im.n_frames >= 1
