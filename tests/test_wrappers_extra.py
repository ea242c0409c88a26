"""Coverage for the remaining wrappers: Transform*, VecEnv, reward
normalization, frozen-stat eval stepping."""

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.envs import make, wrappers


def test_transform_observation():
    env, params = make("CartPole-v1")
    env = wrappers.TransformObservation(env, lambda o: o * 2.0)
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    raw_env, _ = make("CartPole-v1")
    raw_obs, _ = raw_env.reset(jax.random.PRNGKey(0), params)
    np.testing.assert_allclose(np.asarray(obs), np.asarray(raw_obs) * 2.0)


def test_transform_reward():
    env, params = make("CartPole-v1")
    env = wrappers.TransformReward(env, lambda r: r * 10.0)
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    obs, state, r, d, _ = env.step(jax.random.PRNGKey(1), state, jnp.asarray(0), params)
    assert float(r) == 10.0


def test_vec_env_explicit_keys():
    env, params = make("CartPole-v1")
    venv = wrappers.VecEnv(env)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    obs, state = venv.reset(keys, params)
    assert obs.shape == (4, 4)
    obs2, state, r, d, _ = venv.step(keys, state, jnp.zeros(4, jnp.int32), params)
    assert r.shape == (4,)
    # per-env keys: different keys -> different resets
    assert not np.allclose(np.asarray(obs[0]), np.asarray(obs[1]))


def test_normalize_reward_running_scale():
    env, params = make("Pendulum-v1")
    venv = wrappers.NormalizeVecReward(wrappers.VecEnv(env), gamma=0.99)
    keys = jax.random.split(jax.random.PRNGKey(0), 32)
    obs, state = venv.reset(keys, params)
    rs = []
    for i in range(30):
        keys = jax.random.split(jax.random.PRNGKey(i), 32)
        actions = jax.random.uniform(jax.random.PRNGKey(100 + i), (32, 1),
                                     minval=-2, maxval=2)
        obs, state, r, d, _ = venv.step(keys, state, actions, params)
        rs.append(np.asarray(r))
    # normalized rewards should be O(1) scale, not Pendulum's raw ~-10
    assert 0.05 < np.abs(np.concatenate(rs)).mean() < 5.0


def test_normalize_obs_eval_step_frozen():
    env, params = make("CartPole-v1")
    venv = wrappers.NormalizeVecObservation(wrappers.BatchEnv(env, num_envs=16))
    obs, state = venv.reset(jax.random.PRNGKey(0), params)
    mean_before = np.asarray(state.mean).copy()
    actions = jnp.zeros(16, jnp.int32)
    obs, state2, r, d, _ = venv.eval_step(jax.random.PRNGKey(1), state, actions, params)
    np.testing.assert_array_equal(np.asarray(state2.mean), mean_before)
    # the training step DOES update stats
    obs, state3, r, d, _ = venv.step(jax.random.PRNGKey(1), state, actions, params)
    assert not np.array_equal(np.asarray(state3.mean), mean_before)


def test_scrub_nan_wrapper():
    """ScrubNaN zeroes non-finite rewards/obs at the env boundary and
    counts the events in info (brax_wrappers.py:210-213 role)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from purejaxql_tpu.envs import make, wrappers

    env, params = make("Pendulum-v1")

    class PoisonReward(wrappers.Wrapper):
        def step(self, key, state, action, params=None):
            obs, state, reward, done, info = self._env.step(
                key, state, action, params
            )
            # poison reward always, and one obs component on odd envs
            reward = reward * jnp.nan
            obs = obs.at[..., 0].set(jnp.inf)
            return obs, state, reward, done, info

    wrapped = wrappers.ScrubNaN(
        PoisonReward(wrappers.VecEnv(env))
    )
    key = jax.random.PRNGKey(0)
    obs, state = wrapped.reset(jax.random.split(key, 4), params)
    obs, state, rew, done, info = wrapped.step(
        jax.random.split(key, 4), state, jnp.zeros((4, 1)), params
    )
    assert np.isfinite(np.asarray(obs)).all()
    assert (np.asarray(rew) == 0.0).all()
    # per-env counts (shape matches reward so (T, E) done-masked metric
    # aggregation broadcasts): 1 reward + 1 obs lane per env
    assert np.asarray(info["nan_events"]).shape == np.asarray(rew).shape
    assert int(np.asarray(info["nan_events"]).sum()) == 8

    # a healthy env reports zero events
    clean = wrappers.ScrubNaN(wrappers.VecEnv(env))
    obs, state = clean.reset(jax.random.split(key, 4), params)
    obs, state, rew, done, info = clean.step(
        jax.random.split(key, 4), state, jnp.zeros((4, 1)), params
    )
    assert int(np.asarray(info["nan_events"]).sum()) == 0


def test_ac_trains_with_scrub_nan_default():
    """The AC trainer composes ScrubNaN by default and still learns-runs."""
    import jax
    import numpy as np

    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn_ac import make_train

    config = compose(
        alg="pqn_pendulum",
        overrides=[
            "TOTAL_TIMESTEPS=4096", "NUM_ENVS=16", "NUM_STEPS=16",
            "NUM_MINIBATCHES=2", "NUM_EPOCHS=1",
            "ACTOR_HIDDEN_SIZES=[32,32]", "CRITIC_HIDDEN_SIZES=[32,32]",
            "TEST_DURING_TRAINING=False",
        ],
    )
    outs = jax.block_until_ready(
        jax.jit(jax.vmap(make_train(config)))(
            jax.random.split(jax.random.PRNGKey(0), 1)
        )
    )
    assert np.isfinite(np.asarray(outs["metrics"]["value_loss"])).all()


def test_scatter_resets_matches_expand_exactly():
    """The scatter routing must equal the reference gather-expand +
    select BIT-EXACTLY whenever done count <= num_resets — it relies on
    weighted no-replacement sampling always ranking done envs above
    zero-probability ones. Beyond num_resets dones the extras are
    deferred (live rows untouched), checked separately below."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from purejaxql_tpu.envs import wrappers

    num_envs, num_resets = 32, 8
    key = jax.random.PRNGKey(0)
    live = {
        "a": jax.random.normal(key, (num_envs, 5)),
        "b": jax.random.randint(key, (num_envs,), 0, 99),
    }
    resets = {
        "a": jax.random.normal(jax.random.fold_in(key, 1), (num_resets, 5)),
        "b": jax.random.randint(
            jax.random.fold_in(key, 2), (num_resets,), 100, 199
        ),
    }

    def expand_reference(done, reset_indexes):
        re_x = jax.tree_util.tree_map(lambda x: x[reset_indexes], resets)

        def select(re, st):
            d = done.reshape(done.shape + (1,) * (st.ndim - 1))
            return jnp.where(d, re, st)

        return jax.tree_util.tree_map(select, re_x, live)

    for count in [0, 1, 3, 8, 20, 32]:
        for trial in range(5):
            k = jax.random.fold_in(key, count * 10 + trial)
            perm = jax.random.permutation(k, num_envs)
            done = jnp.zeros(num_envs, bool).at[perm[:count]].set(True)
            # exactly the wrappers' routing construction
            k2 = jax.random.fold_in(k, 7)
            reset_indexes = jnp.arange(num_resets).repeat(
                num_envs // num_resets
            )
            being_reset = jax.random.choice(
                k2,
                jnp.arange(num_envs),
                shape=(num_resets,),
                p=done.astype(jnp.float32),
                replace=False,
            )
            reset_indexes = reset_indexes.at[being_reset].set(
                jnp.arange(num_resets)
            )
            got = jax.jit(
                lambda d, br: wrappers._scatter_resets(
                    d, br, resets, live
                )
            )(done, being_reset)
            if count <= num_resets:
                want = expand_reference(done, reset_indexes)
                for lk in live:
                    np.testing.assert_array_equal(
                        np.asarray(got[lk]), np.asarray(want[lk]),
                        err_msg=f"count={count} trial={trial} leaf={lk}",
                    )
            else:
                # deferral: exactly the num_resets sampled done envs were
                # reset; every other row (incl. the extra done envs) is
                # untouched
                br = np.asarray(being_reset)
                for lk in live:
                    g, lv = np.asarray(got[lk]), np.asarray(live[lk])
                    mask = np.zeros(num_envs, bool)
                    mask[br] = True
                    np.testing.assert_array_equal(g[~mask], lv[~mask])
                    np.testing.assert_array_equal(
                        g[br], np.asarray(resets[lk])
                    )
