"""C++ host env pool tests (builds purejaxql_tpu/cpp/ via make on first use)."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("make") is None or shutil.which("g++") is None,
    reason="native toolchain unavailable",
)


def test_pool_basic_step():
    from purejaxql_tpu.envs.hostpool import HostEnvPool

    pool = HostEnvPool("CartPole-v1", num_envs=32, seed=0)
    obs = pool.reset()
    assert obs.shape == (32, 4)
    assert pool.num_actions == 2
    total_d = 0
    for _ in range(300):
        actions = np.random.randint(0, 2, 32)
        obs, r, d = pool.step(actions)
        assert obs.shape == (32, 4)
        assert ((r == 0.0) | (r == 1.0)).all()
        total_d += d.sum()
    # random cartpole episodes last ~20 steps
    assert 100 < total_d < 1000
    pool.close()


def test_pool_deterministic_given_seed():
    from purejaxql_tpu.envs.hostpool import HostEnvPool

    def run(seed):
        pool = HostEnvPool("CartPole-v1", num_envs=8, seed=seed)
        obs = pool.reset()
        outs = [obs]
        for i in range(20):
            obs, r, d = pool.step(np.full(8, i % 2, np.int32))
            outs.append(obs)
        pool.close()
        return np.stack(outs)

    a, b = run(7), run(7)
    np.testing.assert_array_equal(a, b)
    c = run(8)
    assert not np.array_equal(a, c)


def test_pool_acrobot():
    from purejaxql_tpu.envs.hostpool import HostEnvPool

    pool = HostEnvPool("Acrobot-v1", num_envs=16, seed=0)
    obs = pool.reset()
    assert obs.shape == (16, 6)
    obs, r, d = pool.step(np.zeros(16, np.int32))
    assert (r <= 0).all()
    pool.close()


def test_pool_unknown_env():
    from purejaxql_tpu.envs.hostpool import HostEnvPool

    with pytest.raises(ValueError):
        HostEnvPool("DoesNotExist-v0", num_envs=4)


def test_callback_env_in_graph():
    """Host envs stepped from inside a jitted scan via io_callback."""
    import jax
    from purejaxql_tpu.envs.hostpool import HostEnvPool, make_callback_env

    pool = HostEnvPool("CartPole-v1", num_envs=16, seed=0)
    reset_fn, step_fn = make_callback_env(pool)

    def rollout(rng):
        token, obs = reset_fn()

        def body(carry, _):
            token, obs, rng = carry
            rng, k = jax.random.split(rng)
            actions = jax.random.randint(k, (16,), 0, 2)
            token, obs, rew, done = step_fn(token, actions)
            return (token, obs, rng), rew

        (_, _, _), rews = jax.lax.scan(body, (token, obs, rng), None, 100)
        return rews.sum()

    total = jax.jit(rollout)(jax.random.PRNGKey(0))
    assert float(total) == 1600.0  # 100 steps x 16 envs x reward 1
    pool.close()


def test_host_matches_device_dynamics():
    """C++ CartPole must follow the same trajectory as the JAX CartPole
    given the same start state and actions (deterministic dynamics)."""
    import jax
    import jax.numpy as jnp
    from purejaxql_tpu.envs import make
    from purejaxql_tpu.envs.hostpool import HostEnvPool

    env, params = make("CartPole-v1")
    pool = HostEnvPool("CartPole-v1", num_envs=1, seed=0)
    host_obs = pool.reset()[0]

    # inject the host start state into the device env
    from purejaxql_tpu.envs.classic.cartpole import CartPoleState

    state = CartPoleState(
        x=jnp.asarray(host_obs[0]),
        x_dot=jnp.asarray(host_obs[1]),
        theta=jnp.asarray(host_obs[2]),
        theta_dot=jnp.asarray(host_obs[3]),
        time=jnp.asarray(0),
    )
    for i in range(30):
        action = i % 2
        host_obs, host_r, host_d = pool.step(np.asarray([action], np.int32))
        obs, state, r, d, _ = env.step(
            jax.random.PRNGKey(i), state, jnp.asarray(action), params
        )
        if bool(host_d[0]) or bool(d):
            break
        np.testing.assert_allclose(
            host_obs[0], np.asarray(obs), rtol=1e-5, atol=1e-5
        )
    pool.close()


def test_host_breakout_grid_obs():
    """The C++ game env exposes rank-3 obs; random play scores and dies
    like the in-graph MinAtar Breakout."""
    from purejaxql_tpu.envs.hostpool import HostEnvPool

    pool = HostEnvPool("Breakout-MinAtar", num_envs=32, seed=0)
    assert pool.obs_shape == (10, 10, 4)
    assert pool.num_actions == 3
    obs = pool.reset()
    binary = np.isin(obs, [0.0, 1.0]).all()
    assert binary
    total_r, total_d = 0.0, 0
    for i in range(300):
        obs, r, d = pool.step(np.random.randint(0, 3, 32))
        total_r += r.sum()
        total_d += d.sum()
    assert total_r > 0, "no bricks hit"
    assert total_d > 50, "episodes never end"
    pool.close()


def test_host_cnn_training():
    """CNN Q-net over C++ grid envs inside jit — the pqn_atari shape."""
    import jax
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn_host import make_train

    config = compose(
        alg="pqn_minatar",
        overrides=[
            "ENV_NAME=Breakout-MinAtar", "TOTAL_TIMESTEPS=16384",
            "TOTAL_TIMESTEPS_DECAY=16384", "NUM_ENVS=32", "NUM_STEPS=16",
            "NUM_MINIBATCHES=4", "NUM_EPOCHS=1", "TEST_DURING_TRAINING=False",
        ],
    )
    outs = jax.block_until_ready(
        jax.jit(make_train(config))(jax.random.PRNGKey(0))
    )
    assert np.isfinite(np.asarray(outs["metrics"]["td_loss"])).all()


def _jax_random_play_stats(env_name, num_envs, steps, seed=0):
    """Random-policy (reward_rate, done_rate) for the in-graph twin."""
    import jax
    import jax.numpy as jnp
    from purejaxql_tpu.envs import make

    env, params = make(env_name)
    n_act = env.action_space(params).n

    def run(key):
        keys = jax.random.split(key, num_envs)
        obs, state = jax.vmap(env.reset, in_axes=(0, None))(keys, params)

        def body(carry, _):
            key, state = carry
            key, ka, ks = jax.random.split(key, 3)
            act = jax.random.randint(ka, (num_envs,), 0, n_act)
            sk = jax.random.split(ks, num_envs)
            obs, state, r, d, _ = jax.vmap(env.step, in_axes=(0, 0, 0, None))(
                sk, state, act, params
            )
            return (key, state), (r.sum(), d.sum())
        (_, _), (rs, ds) = jax.lax.scan(body, (key, state), None, steps)
        return rs.sum(), ds.sum()

    r, d = jax.jit(run)(jax.random.PRNGKey(seed))
    total = num_envs * steps
    return float(r) / total, float(d) / total


def _host_random_play_stats(env_name, num_envs, steps, seed=0):
    from purejaxql_tpu.envs.hostpool import HostEnvPool

    pool = HostEnvPool(env_name, num_envs=num_envs, seed=seed)
    pool.reset()
    rng = np.random.RandomState(seed)
    tr, td = 0.0, 0
    for _ in range(steps):
        a = rng.randint(0, pool.num_actions, num_envs).astype(np.int32)
        _, r, d = pool.step(a)
        tr += r.sum()
        td += d.sum()
    pool.close()
    total = num_envs * steps
    return tr / total, td / total


@pytest.mark.parametrize(
    "game,channels,actions",
    [
        ("Asterix-MinAtar", 4, 5),
        ("Freeway-MinAtar", 7, 3),
        ("SpaceInvaders-MinAtar", 6, 4),
        ("Seaquest-MinAtar", 10, 6),
    ],
)
def test_host_game_matches_jax_twin_statistics(game, channels, actions):
    """Each C++ game must behave like its JAX twin under random play:
    same obs layout/action set, and reward/done rates in the same regime
    (dynamics are stochastic, so the cross-check is distributional)."""
    from purejaxql_tpu.envs.hostpool import HostEnvPool

    pool = HostEnvPool(game, num_envs=4, seed=0)
    assert pool.obs_shape == (10, 10, channels)
    assert pool.num_actions == actions
    obs = pool.reset()
    assert np.isin(obs, [0.0, 1.0]).all()
    pool.close()

    hr, hd = _host_random_play_stats(game, 64, 800)
    jr, jd = _jax_random_play_stats(game, 64, 800)
    # same regime: rates within ~2x of each other; both-zero also agrees
    # (Freeway's only terminal is the 2500-step limit, beyond this run)
    if hd > 0 or jd > 0:
        assert 0.4 < (hd + 1e-6) / (jd + 1e-6) < 2.5, (game, hd, jd)
    if jr > 1e-4 or hr > 1e-4:
        assert 0.3 < (hr + 1e-6) / (jr + 1e-6) < 3.0, (game, hr, jr)


def test_host_training_all_games_smoke():
    """pqn_host trains (one tiny run) on every native game from the CLI
    config — the 'EnvPool role' completion check."""
    import jax
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn_host import make_train

    for game in ["Asterix-MinAtar", "Seaquest-MinAtar"]:
        config = compose(
            alg="pqn_host_minatar",
            overrides=[
                f"ENV_NAME={game}", "TOTAL_TIMESTEPS=4096",
                "TOTAL_TIMESTEPS_DECAY=4096", "NUM_ENVS=16", "NUM_STEPS=16",
                "NUM_MINIBATCHES=4", "NUM_EPOCHS=1",
            ],
        )
        outs = jax.block_until_ready(
            jax.jit(make_train(config))(jax.random.PRNGKey(0))
        )
        assert np.isfinite(np.asarray(outs["metrics"]["td_loss"])).all(), game
