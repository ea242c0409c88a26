"""The bundled Breakout plug-in: the second real game behind the envhost
C-ABI socket (cpp/plugins/breakout/), with ALE-style host-side
preprocessing and a RAM-obs build — proving the plug-in mechanism
generalizes past Pong (docs/ENVHOST_PLUGIN.md; reference role:
EnvPool ALE Breakout, atari_wrapper.py:14-72 score table)."""

import shutil

import jax
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose

pytestmark = pytest.mark.skipif(
    shutil.which("make") is None or shutil.which("g++") is None,
    reason="native toolchain unavailable",
)

NOOP, FIRE, RIGHT, LEFT = 0, 1, 2, 3


@pytest.fixture(scope="module")
def pools():
    from purejaxql_tpu.envs.hostpool import HostEnvPool

    ram = HostEnvPool("BreakoutRam-EH", num_envs=8, seed=0)
    pix = HostEnvPool("Breakout-EH", num_envs=4, seed=0)
    yield ram, pix
    ram.close()
    pix.close()


def test_shapes_and_action_set(pools):
    ram, pix = pools
    assert ram.obs_shape == (24,)
    assert pix.obs_shape == (84, 84, 4)
    assert ram.num_actions == pix.num_actions == 4  # Breakout-v5 minimal


def test_ball_held_until_fire(pools):
    """ALE convention: the ball does not move until FIRE serves it."""
    ram, _ = pools
    obs = ram.reset()
    assert (obs[:, 6] == 0.0).all()  # in_play flag off
    for _ in range(10):
        obs, _, _ = ram.step(np.full(8, NOOP, np.int32))
    assert (obs[:, 6] == 0.0).all()
    assert (np.abs(obs[:, 2:4]) < 1e-6).all()  # ball velocity zero
    obs, _, _ = ram.step(np.full(8, FIRE, np.int32))
    assert (obs[:, 6] == 1.0).all()
    assert (np.abs(obs[:, 3]) > 0.0).all()  # moving (upward)


def test_bricks_score_and_deplete(pools):
    """Served balls eventually hit the wall: reward arrives in the ALE
    row-score set and the brick profile depletes."""
    ram, _ = pools
    obs = ram.reset()
    ram.step(np.full(8, FIRE, np.int32))
    total = np.zeros(8)
    rng = np.random.RandomState(0)
    profile0 = obs[:, 10:24].sum(axis=1)
    for t in range(400):
        # keep the paddle under the ball (obs[9] = bx - px) and re-fire
        # after life losses so the rally continues
        a = np.where(obs[:, 9] > 0.02, RIGHT, np.where(obs[:, 9] < -0.02, LEFT, FIRE))
        obs, r, d = ram.step(a.astype(np.int32))
        total += r
    assert (total > 0).all(), total  # every env broke bricks
    assert (obs[:, 10:24].sum(axis=1) < profile0).any()


def test_missing_the_ball_costs_lives_and_ends_episode(pools):
    """A paddle parked in the corner loses all 5 lives -> done."""
    ram, _ = pools
    ram.reset()
    done_seen = np.zeros(8, bool)
    for t in range(2000):
        # serve whenever held, otherwise hide in the corner
        obs, r, d = ram.step(np.full(8, FIRE if t % 7 == 0 else LEFT, np.int32))
        if d.any():
            # auto-reset hands back a fresh 5-life game immediately
            assert (obs[d, 5] == 1.0).all()
        done_seen |= d
        if done_seen.all():
            break
    assert done_seen.all()


def test_pixel_obs_renders_wall_paddle_ball(pools):
    _, pix = pools
    obs = pix.reset().reshape(4, 84, 84, 4)
    newest = obs[..., -1]
    # brick wall band rows populated
    assert (newest[:, 15:33, :] > 0.3).any(axis=(1, 2)).all()
    # paddle band
    assert (newest[:, 80:82, :] > 0.7).any(axis=(1, 2)).all()
    # something at max brightness (the ball)
    assert (newest >= 1.0 - 1e-6).any(axis=(1, 2)).all()


def test_pqn_host_trains_on_breakout_ram_smoke():
    from purejaxql_tpu.algo.pqn_host import make_train

    config = compose(
        alg="pqn_host_minatar",
        overrides=[
            "ENV_NAME=BreakoutRam-EH",
            "TOTAL_TIMESTEPS=8192",
            "TOTAL_TIMESTEPS_DECAY=8192",
            "NUM_ENVS=16",
            "NUM_STEPS=16",
            "NUM_MINIBATCHES=2",
            "NUM_EPOCHS=1",
            "HIDDEN_SIZE=32",
            "TEST_ENVS=4",
        ],
    )
    out = jax.block_until_ready(
        jax.jit(make_train(dict(config)))(jax.random.PRNGKey(0))
    )
    assert np.isfinite(np.asarray(out["metrics"]["td_loss"])).all()


@pytest.mark.slow
def test_host_trainer_learns_breakout_ram():
    """End-to-end learning on the second plug-in game: returns climb
    well clear of random play (measured on this seed: train 9.8 early ->
    16.7 late, test 17.1, a do-nothing policy scores 0 since FIRE never
    serves) within a 3M-step budget."""
    from purejaxql_tpu.algo.pqn_host import make_train

    config = compose(
        alg="pqn_host_minatar",
        overrides=[
            "ENV_NAME=BreakoutRam-EH",
            "TOTAL_TIMESTEPS=3000000",
            "TOTAL_TIMESTEPS_DECAY=3000000",
            "NUM_ENVS=64",
            "NUM_STEPS=32",
            "NUM_MINIBATCHES=8",
            "NUM_EPOCHS=2",
            "LR=0.0003",
            "HIDDEN_SIZE=128",
            "TEST_ENVS=8",
            "EPS_DECAY=0.25",
        ],
    )
    out = jax.block_until_ready(
        jax.jit(make_train(dict(config)))(jax.random.PRNGKey(0))
    )
    rets = np.asarray(out["metrics"]["returned_episode_returns"])
    n = len(rets)
    early = float(np.nanmean(rets[: n // 10]))
    late = float(np.nanmean(rets[-n // 10:]))
    assert late > max(1.4 * early, 13.0), (early, late)
