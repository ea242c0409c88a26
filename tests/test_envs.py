"""Env correctness tests: dynamics sanity, auto-reset, wrappers, registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.envs import make, registered_envs, wrappers


DISCRETE_ENVS = [
    "CartPole-v1", "Acrobot-v1", "MountainCar-v0", "MemoryChain-bsuite",
    "Catch-bsuite", "DeepSea-bsuite",
]


@pytest.mark.parametrize("name", DISCRETE_ENVS)
def test_reset_step_shapes(name):
    env, params = make(name)
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key, params)
    assert obs.shape == env.observation_space(params).shape
    action = env.action_space(params).sample(key)
    obs2, state2, reward, done, info = env.step(key, state, action, params)
    assert obs2.shape == obs.shape
    assert reward.dtype == jnp.float32
    assert done.dtype == jnp.bool_ or done.dtype == jnp.bool


@pytest.mark.parametrize("name", DISCRETE_ENVS)
def test_vmap_rollout(name):
    env, params = make(name)
    n = 8
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    obs, state = jax.vmap(env.reset, in_axes=(0, None))(keys, params)

    def step(carry, _):
        obs, state, rng = carry
        rng, ra, rs = jax.random.split(rng, 3)
        actions = jax.vmap(env.action_space(params).sample)(jax.random.split(ra, n))
        step_keys = jax.random.split(rs, n)
        obs, state, r, d, _ = jax.vmap(env.step, in_axes=(0, 0, 0, None))(
            step_keys, state, actions, params
        )
        return (obs, state, rng), (r, d)

    (_, _, _), (rs, ds) = jax.lax.scan(
        step, (obs, state, jax.random.PRNGKey(1)), None, 50
    )
    assert rs.shape == (50, n)
    assert jnp.all(jnp.isfinite(rs))


def test_cartpole_random_episode_length():
    env, params = make("CartPole-v1")
    env = wrappers.Log(env)
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key, params)

    def step(carry, _):
        obs, state, rng = carry
        rng, ra, rs = jax.random.split(rng, 3)
        action = jax.random.randint(ra, (), 0, 2)
        obs, state, r, d, info = env.step(rs, state, action, params)
        return (obs, state, rng), (d, info["returned_episode_lengths"])

    _, (dones, lens) = jax.lax.scan(step, (obs, state, key), None, 2000)
    # Random CartPole episodes last ~10-40 steps.
    assert dones.sum() > 30
    assert 5 < float(lens[-1]) < 80


def test_auto_reset_restarts_episode():
    env, params = make("CartPole-v1")
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key, params)
    # Push right forever until done, then check time resets.
    for i in range(200):
        key, sk = jax.random.split(key)
        obs, state, r, done, _ = env.step(sk, state, jnp.asarray(1), params)
        if bool(done):
            break
    assert bool(done)
    assert int(state.time) == 0  # auto-reset happened


def test_log_wrapper_accounting():
    env, params = make("CartPole-v1")
    env = wrappers.Log(env)
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key, params)
    ep_len = 0
    for i in range(500):
        key, sk = jax.random.split(key)
        obs, state, r, done, info = env.step(sk, state, jnp.asarray(0), params)
        ep_len += 1
        if bool(done):
            assert int(info["returned_episode_lengths"]) == ep_len
            assert float(info["returned_episode_returns"]) == pytest.approx(ep_len)
            break
    assert bool(done)


def test_optimistic_reset_vec_env():
    env, params = make("CartPole-v1")
    env = wrappers.Log(env)
    venv = wrappers.OptimisticResetVecEnv(env, num_envs=16, reset_ratio=4)
    key = jax.random.PRNGKey(0)
    obs, state = venv.reset(key, params)
    assert obs.shape[0] == 16

    def step(carry, _):
        obs, state, rng = carry
        rng, ra, rs = jax.random.split(rng, 3)
        actions = jax.random.randint(ra, (16,), 0, 2)
        obs, state, r, d, info = venv.step(rs, state, actions, params)
        return (obs, state, rng), (d, info["returned_episode_lengths"])

    _, (dones, lens) = jax.lax.scan(step, (obs, state, key), None, 300)
    assert dones.sum() > 20  # episodes do end and restart
    # after a done, env keeps running (auto-reset via shared pool)
    assert jnp.isfinite(lens).all()


def test_batch_env_wrapper():
    env, params = make("CartPole-v1")
    venv = wrappers.BatchEnv(wrappers.Log(env), num_envs=8)
    obs, state = venv.reset(jax.random.PRNGKey(0), params)
    assert obs.shape == (8, 4)
    actions = jnp.zeros(8, jnp.int32)
    obs, state, r, d, info = venv.step(jax.random.PRNGKey(1), state, actions, params)
    assert r.shape == (8,)


def test_normalize_obs_wrapper():
    env, params = make("CartPole-v1")
    venv = wrappers.NormalizeVecObservation(wrappers.BatchEnv(env, num_envs=64))
    obs, state = venv.reset(jax.random.PRNGKey(0), params)
    actions = jnp.zeros(64, jnp.int32)
    for i in range(5):
        obs, state, r, d, info = venv.step(
            jax.random.PRNGKey(i), state, actions, params
        )
    assert abs(float(obs.mean())) < 2.0


def test_registry_lists_envs():
    envs = registered_envs()
    for name in DISCRETE_ENVS + ["Pendulum-v1"]:
        assert name in envs


def test_memory_chain_needs_memory():
    env, params = make("MemoryChain-bsuite")
    obs, state = env.reset(jax.random.PRNGKey(3), params)
    # context visible at t=0
    assert abs(float(obs[2])) == 1.0
    obs2, state2, r, d, _ = env.step(
        jax.random.PRNGKey(4), state, jnp.asarray(0), params
    )
    # context hidden afterwards
    assert float(obs2[2]) == 0.0


def test_catch_tracking_policy_catches():
    """Moving the paddle toward the ball's column every step catches every
    drop (+1); parking the paddle off-column misses (-1)."""
    env, params = make("Catch-bsuite")

    def play(track):
        obs, state = env.reset(jax.random.PRNGKey(5), params)
        total = 0.0
        for t in range(params.rows - 1):
            dx = jnp.sign(state.ball_x - state.paddle_x)
            a = (dx + 1) if track else jnp.asarray(1)  # track or stay
            obs, state, r, d, _ = env.step(
                jax.random.PRNGKey(t), state, jnp.asarray(a), params
            )
            total += float(r)
        return total, bool(d)

    caught, done = play(True)
    assert caught == 1.0 and done
    # worst case for "stay": drop where the ball starts off-center
    env2, params2 = make("Catch-bsuite")
    obs, state = env2.reset(jax.random.PRNGKey(11), params2)
    missed = 0.0
    for t in range(params2.rows - 1):
        if int(state.ball_x) == int(state.paddle_x):
            break
        obs, state, r, d, _ = env2.step(
            jax.random.PRNGKey(t), state, jnp.asarray(1), params2
        )
        missed += float(r)
    if missed:  # only assert when the seed gave an off-center drop
        assert missed == -1.0


def test_deep_sea_treasure_and_penalty():
    """Only the all-right trajectory pays +1 (minus the per-move cost);
    all-left earns exactly 0; the per-column action map scrambles which
    raw action means right."""
    env, params = make("DeepSea-bsuite")
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    assert obs.shape == (params.size * params.size,)

    def play(go_right):
        o, s = env.reset(jax.random.PRNGKey(0), params)
        total = 0.0
        for t in range(params.size):
            a = s.action_map[s.column] if go_right else 1 - s.action_map[s.column]
            o, s, r, d, _ = env.step(
                jax.random.PRNGKey(t), s, jnp.asarray(a), params
            )
            total += float(r)
        return total, bool(d)

    right_total, d1 = play(True)
    left_total, d2 = play(False)
    assert d1 and d2
    np.testing.assert_allclose(right_total, 1.0 - 0.01, atol=1e-6)
    assert left_total == 0.0
