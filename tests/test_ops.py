"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
TPU by bench/TPU runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.algo.returns import lambda_returns
from purejaxql_tpu.ops.pallas_returns import lambda_returns_pallas
from purejaxql_tpu.ops.pallas_explore import eps_greedy_pallas

# The hardware-PRNG kernel (pltpu.prng_seed) has no CPU interpret rule;
# its tests run only on a real TPU (see also bench/TPU validation runs).
requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="pltpu PRNG primitives need TPU",
)


def test_pallas_lambda_matches_xla():
    rng = np.random.RandomState(0)
    T, E = 16, 200  # E deliberately not a multiple of 128 (padding path)
    rewards = rng.randn(T, E).astype(np.float32)
    dones = (rng.rand(T, E) < 0.15).astype(np.float32)
    max_qs = rng.randn(T, E).astype(np.float32)
    last_q = rng.randn(E).astype(np.float32)

    want = lambda_returns(
        jnp.asarray(last_q), jnp.asarray(rewards), jnp.asarray(dones),
        jnp.asarray(max_qs), 0.99, 0.9,
    )
    got = lambda_returns_pallas(
        jnp.asarray(last_q), jnp.asarray(rewards), jnp.asarray(dones),
        jnp.asarray(max_qs), 0.99, 0.9, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pallas_lambda_aligned_width():
    rng = np.random.RandomState(1)
    T, E = 8, 256
    rewards = rng.randn(T, E).astype(np.float32)
    dones = np.zeros((T, E), np.float32)
    max_qs = rng.randn(T, E).astype(np.float32)
    last_q = rng.randn(E).astype(np.float32)
    want = lambda_returns(
        jnp.asarray(last_q), jnp.asarray(rewards), jnp.asarray(dones),
        jnp.asarray(max_qs), 0.95, 0.5,
    )
    got = lambda_returns_pallas(
        jnp.asarray(last_q), jnp.asarray(rewards), jnp.asarray(dones),
        jnp.asarray(max_qs), 0.95, 0.5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@requires_tpu
def test_pallas_eps_greedy_statistics():
    # compiled path: the hardware PRNG has no interpreter rule anywhere
    rng = np.random.RandomState(2)
    E, A = 512, 6
    q_vals = rng.randn(E, A).astype(np.float32)
    greedy = q_vals.argmax(-1)

    # eps=0 -> all greedy
    actions = np.asarray(
        eps_greedy_pallas(jnp.asarray(3), jnp.asarray(q_vals), jnp.asarray(0.0))
    )
    np.testing.assert_array_equal(actions, greedy)

    # eps=1 -> all random-ish: roughly uniform action histogram
    actions = np.asarray(
        eps_greedy_pallas(jnp.asarray(3), jnp.asarray(q_vals), jnp.asarray(1.0))
    )
    counts = np.bincount(actions, minlength=A)
    assert counts.min() > E / A * 0.5, counts

    # eps=0.5 -> a mix: about half the actions deviate from greedy at most
    actions = np.asarray(
        eps_greedy_pallas(jnp.asarray(4), jnp.asarray(q_vals), jnp.asarray(0.5))
    )
    frac_greedy = (actions == greedy).mean()
    assert 0.4 < frac_greedy < 0.8, frac_greedy


@requires_tpu
def test_pallas_eps_greedy_seed_dependence():
    q_vals = jnp.zeros((64, 4))
    a1 = np.asarray(eps_greedy_pallas(jnp.asarray(1), q_vals, jnp.asarray(1.0)))
    a2 = np.asarray(eps_greedy_pallas(jnp.asarray(2), q_vals, jnp.asarray(1.0)))
    assert not np.array_equal(a1, a2)


def test_fused_rollout_interpret_exactness():
    """The fused Breakout rollout kernel (ops/pallas_rollout.py) with the
    PRNG disabled (greedy, no resets in 5 steps) matches the XLA engine's
    env dynamics, obs build, and action stream exactly; Q-values agree to
    conv-vs-matmul accumulation order (~1e-6)."""
    import numpy as np
    from purejaxql_tpu.envs import make
    from purejaxql_tpu.models.cnn import CNNQNetwork
    from purejaxql_tpu.ops.pallas_rollout import (
        breakout_from_state_matrix,
        breakout_rollout_pallas,
        state_matrix_from_breakout,
    )

    B, T = 16, 5
    env, params = make("Breakout-MinAtar")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    obs0, state0 = jax.vmap(env.reset, in_axes=(0, None))(keys, params)
    net = CNNQNetwork(action_dim=3, norm_type="layer_norm", norm_input=False)
    variables = net.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 10, 10, 4)), train=False
    )

    def ref_step(carry, _):
        obs, st = carry
        q = net.apply(variables, obs, train=False)
        a = jnp.argmax(q, axis=-1)
        o2, st2, r, d, _ = jax.vmap(env.step_env, in_axes=(0, 0, 0, None))(
            jax.random.split(jax.random.PRNGKey(2), B), st, a, params
        )
        return (o2, st2), (obs, a, r, d, q)

    (_, final_st), (obs_ref, act_ref, rew_ref, done_ref, q_ref) = jax.lax.scan(
        ref_step, (obs0, state0), None, T
    )
    st0, brick0 = state_matrix_from_breakout(state0)
    obs_seq, act, rew, done_i, q_seq, fobs, st1, brick1 = (
        breakout_rollout_pallas(
            jnp.asarray(0), jnp.asarray(0.0), variables["params"], st0,
            brick0, T, use_prng=False, interpret=True,
        )
    )
    assert np.allclose(np.asarray(obs_seq), np.asarray(obs_ref))
    assert np.array_equal(np.asarray(act), np.asarray(act_ref))
    assert np.array_equal(np.asarray(rew), np.asarray(rew_ref))
    assert np.array_equal(
        np.asarray(done_i).astype(bool), np.asarray(done_ref)
    )
    assert np.abs(np.asarray(q_seq[..., :3]) - np.asarray(q_ref)).max() < 1e-4
    # final env state round-trips into a BreakoutState the next update
    # (or the non-fused path) can consume
    bs = breakout_from_state_matrix(st1, brick1)
    for f in ("ball_y", "ball_x", "ball_dir", "pos", "last_y", "last_x", "time"):
        assert np.array_equal(
            np.asarray(getattr(bs, f)), np.asarray(getattr(final_st, f))
        ), f
    assert np.array_equal(
        np.asarray(bs.brick_map), np.asarray(final_st.brick_map)
    )


def test_fused_rollout_autoreset_interpret():
    """Deterministic-PRNG variant resets on a missed ball: park the paddle
    far from the ball's landing column by zeroing the Q-path (fresh params
    give near-uniform argmax; instead force termination via max_steps)."""
    import numpy as np
    from purejaxql_tpu.envs import make
    from purejaxql_tpu.models.cnn import CNNQNetwork
    from purejaxql_tpu.ops.pallas_rollout import (
        breakout_rollout_pallas,
        state_matrix_from_breakout,
    )

    B, T = 8, 6
    env, params = make("Breakout-MinAtar")
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    _, state0 = jax.vmap(env.reset, in_axes=(0, None))(keys, params)
    net = CNNQNetwork(action_dim=3, norm_type="layer_norm", norm_input=False)
    variables = net.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 10, 10, 4)), train=False
    )
    st0, brick0 = state_matrix_from_breakout(state0)
    # max_steps=4 forces a time-limit done at step 4, then auto-reset
    obs_seq, act, rew, done_i, q_seq, fobs, st1, brick1 = (
        breakout_rollout_pallas(
            jnp.asarray(0), jnp.asarray(0.0), variables["params"], st0,
            brick0, T, use_prng=False, interpret=True, max_steps=4,
        )
    )
    done = np.asarray(done_i).astype(bool)
    assert done[3].all()  # every env hits the 4-step limit together
    # post-reset state: ball back at y=3, side 0 (deterministic variant),
    # paddle centered, full brick wall
    st1 = np.asarray(st1)
    obs5 = np.asarray(obs_seq)[4]           # first obs after the reset
    assert (np.asarray(obs_seq)[4, :, 1:4, :, 3] == 1.0).all()  # bricks
    assert (obs5[:, 9, 4, 0] == 1.0).all()  # paddle at column 4


def test_fused_cartpole_interpret_exactness():
    """CartPole fused rollout (PRNG off, greedy, no dones in 12 steps)
    matches the XLA engine's physics, obs, actions, and rewards exactly."""
    import numpy as np
    from purejaxql_tpu.envs import make
    from purejaxql_tpu.models.qnet import QNetwork
    from purejaxql_tpu.ops.pallas_rollout import (
        cartpole_from_state_matrix,
        cartpole_rollout_pallas,
        state_matrix_from_cartpole,
    )

    B, T = 16, 12
    env, params = make("CartPole-v1")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    obs0, state0 = jax.vmap(env.reset, in_axes=(0, None))(keys, params)
    net = QNetwork(
        action_dim=2, hidden_size=256, num_layers=2,
        norm_type="layer_norm", norm_input=False,
    )
    variables = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 4)), train=False)

    def ref_step(carry, _):
        obs, st = carry
        q = net.apply(variables, obs, train=False)
        a = jnp.argmax(q, axis=-1)
        o2, st2, r, d, _ = jax.vmap(env.step_env, in_axes=(0, 0, 0, None))(
            jax.random.split(jax.random.PRNGKey(2), B), st, a, params
        )
        return (o2, st2), (obs, a, r, d, q)

    (_, final_st), (obs_ref, act_ref, rew_ref, done_ref, _) = jax.lax.scan(
        ref_step, (obs0, state0), None, T
    )
    assert not np.asarray(done_ref).any()  # exactness window has no resets
    stf0, sti0 = state_matrix_from_cartpole(state0)
    obs_seq, act, rew, done_i, q_seq, fobs, stf1, sti1 = (
        cartpole_rollout_pallas(
            jnp.asarray(0), jnp.asarray(0.0), variables["params"], stf0,
            sti0, T, use_prng=False, interpret=True,
        )
    )
    assert np.allclose(np.asarray(obs_seq), np.asarray(obs_ref), atol=1e-6)
    assert np.array_equal(np.asarray(act), np.asarray(act_ref))
    assert np.array_equal(np.asarray(rew), np.asarray(rew_ref))
    cs = cartpole_from_state_matrix(stf1, sti1)
    for f in ("x", "x_dot", "theta", "theta_dot"):
        assert np.allclose(
            np.asarray(getattr(cs, f)), np.asarray(getattr(final_st, f)),
            atol=1e-6,
        ), f


def test_fused_asterix_interpret_exactness():
    """Asterix fused rollout (PRNG off) with hand-placed entities and
    spawns pushed out matches the XLA engine (auto-reset env.step —
    Asterix's reset is deterministic) on obs/actions/rewards/dones and
    round-trips the final state."""
    import numpy as np
    from purejaxql_tpu.envs import make
    from purejaxql_tpu.models.cnn import CNNQNetwork
    from purejaxql_tpu.ops.pallas_rollout import (
        asterix_from_state_matrix,
        asterix_rollout_pallas,
        state_matrix_from_asterix,
    )

    B, T = 16, 8
    env, params = make("Asterix-MinAtar")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    obs0, state0 = jax.vmap(env.reset, in_axes=(0, None))(keys, params)
    state0 = state0.replace(
        spawn_timer=jnp.full((B,), 50, jnp.int32),
        e_exists=jnp.zeros((B, 8), bool).at[:, 1].set(True).at[:, 4].set(True),
        e_x=jnp.zeros((B, 8), jnp.int32).at[:, 1].set(7).at[:, 4].set(2),
        e_lr=jnp.zeros((B, 8), bool).at[:, 4].set(True),
        e_gold=jnp.zeros((B, 8), bool).at[:, 1].set(True),
        move_timer=jnp.full((B,), 1, jnp.int32),
    )
    net = CNNQNetwork(action_dim=5, norm_type="layer_norm", norm_input=False)
    variables = net.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 10, 10, 4)), train=False
    )

    def ref_step(carry, _):
        obs, st = carry
        q = net.apply(variables, obs, train=False)
        a = jnp.argmax(q, axis=-1)
        o2, st2, r, d, _ = jax.vmap(env.step, in_axes=(0, 0, 0, None))(
            jax.random.split(jax.random.PRNGKey(2), B), st, a, params
        )
        return (o2, st2), (obs, a, r, d, q)

    obs_init = jax.vmap(env.get_obs)(state0)
    (_, final_st), (obs_ref, act_ref, rew_ref, done_ref, _) = jax.lax.scan(
        ref_step, (obs_init, state0), None, T
    )
    st0 = state_matrix_from_asterix(state0)
    obs_seq, act, rew, done_i, q_seq, fobs, st1 = asterix_rollout_pallas(
        jnp.asarray(0), jnp.asarray(0.0), variables["params"], st0,
        T, use_prng=False, interpret=True,
    )
    assert np.allclose(np.asarray(obs_seq), np.asarray(obs_ref))
    assert np.array_equal(np.asarray(act), np.asarray(act_ref))
    assert np.array_equal(np.asarray(rew), np.asarray(rew_ref))
    assert np.array_equal(
        np.asarray(done_i).astype(bool), np.asarray(done_ref)
    )
    a2 = asterix_from_state_matrix(st1)
    for f in (
        "player_x", "player_y", "e_x", "spawn_timer", "move_timer", "time"
    ):
        assert np.array_equal(
            np.asarray(getattr(a2, f)), np.asarray(getattr(final_st, f))
        ), f
    assert np.array_equal(
        np.asarray(a2.e_exists), np.asarray(final_st.e_exists)
    )


def test_fused_freeway_interpret_exactness():
    """Freeway fused rollout (PRNG off, no score/reset in 8 steps —
    reaching the top needs ~27) matches the XLA engine exactly."""
    import numpy as np
    from purejaxql_tpu.envs import make
    from purejaxql_tpu.models.cnn import CNNQNetwork
    from purejaxql_tpu.ops.pallas_rollout import (
        freeway_from_state_matrix,
        freeway_rollout_pallas,
        state_matrix_from_freeway,
    )

    B, T = 16, 8
    env, params = make("Freeway-MinAtar")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    obs0, state0 = jax.vmap(env.reset, in_axes=(0, None))(keys, params)
    net = CNNQNetwork(action_dim=3, norm_type="layer_norm", norm_input=False)
    variables = net.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 10, 10, 7)), train=False
    )

    def ref_step(carry, _):
        obs, st = carry
        q = net.apply(variables, obs, train=False)
        a = jnp.argmax(q, axis=-1)
        o2, st2, r, d, _ = jax.vmap(env.step, in_axes=(0, 0, 0, None))(
            jax.random.split(jax.random.PRNGKey(2), B), st, a, params
        )
        return (o2, st2), (obs, a, r, d)

    (_, final_st), (obs_ref, act_ref, rew_ref, done_ref) = jax.lax.scan(
        ref_step, (obs0, state0), None, T
    )
    st0 = state_matrix_from_freeway(state0)
    obs_seq, act, rew, done_i, _, _, st1 = freeway_rollout_pallas(
        jnp.asarray(0), jnp.asarray(0.0), variables["params"], st0,
        T, use_prng=False, interpret=True,
    )
    assert np.allclose(np.asarray(obs_seq), np.asarray(obs_ref))
    assert np.array_equal(np.asarray(act), np.asarray(act_ref))
    assert np.array_equal(np.asarray(rew), np.asarray(rew_ref))
    f2 = freeway_from_state_matrix(st1)
    for f in ("pos", "car_x", "car_timer", "car_speed", "move_timer", "time"):
        assert np.array_equal(
            np.asarray(getattr(f2, f)), np.asarray(getattr(final_st, f))
        ), f


def test_fused_space_invaders_interpret_exactness():
    """SpaceInvaders fused rollout over 40 steps — the env is RNG-free,
    so marches, drops, shots, kills, wave respawns, deaths, AND
    auto-resets are all compared bit-for-bit against the XLA engine."""
    import numpy as np
    from purejaxql_tpu.envs import make
    from purejaxql_tpu.models.cnn import CNNQNetwork
    from purejaxql_tpu.ops.pallas_rollout import (
        space_invaders_from_state_matrix,
        space_invaders_rollout_pallas,
        state_matrix_from_space_invaders,
    )

    B, T = 16, 40
    env, params = make("SpaceInvaders-MinAtar")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    obs0, state0 = jax.vmap(env.reset, in_axes=(0, None))(keys, params)
    net = CNNQNetwork(action_dim=4, norm_type="layer_norm", norm_input=False)
    variables = net.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 10, 10, 6)), train=False
    )

    def ref_step(carry, _):
        obs, st = carry
        q = net.apply(variables, obs, train=False)
        a = jnp.argmax(q, axis=-1)
        o2, st2, r, d, _ = jax.vmap(env.step, in_axes=(0, 0, 0, None))(
            jax.random.split(jax.random.PRNGKey(2), B), st, a, params
        )
        return (o2, st2), (obs, a, r, d)

    (_, final_st), (obs_ref, act_ref, rew_ref, done_ref) = jax.lax.scan(
        ref_step, (obs0, state0), None, T
    )
    assert np.asarray(rew_ref).sum() > 0  # kills actually occurred
    assert np.asarray(done_ref).sum() > 0  # deaths + resets occurred
    packed = state_matrix_from_space_invaders(state0)
    obs_seq, act, rew, done_i, _, _, st1, al1, fm1, em1 = (
        space_invaders_rollout_pallas(
            jnp.asarray(0), jnp.asarray(0.0), variables["params"],
            *packed, T, use_prng=False, interpret=True,
        )
    )
    assert np.allclose(np.asarray(obs_seq), np.asarray(obs_ref))
    assert np.array_equal(np.asarray(act), np.asarray(act_ref))
    assert np.array_equal(np.asarray(rew), np.asarray(rew_ref))
    assert np.array_equal(
        np.asarray(done_i).astype(bool), np.asarray(done_ref)
    )
    s2 = space_invaders_from_state_matrix(st1, al1, fm1, em1)
    assert np.array_equal(
        np.asarray(s2.alien_map), np.asarray(final_st.alien_map)
    )
    assert np.array_equal(
        np.asarray(s2.e_bullet_map), np.asarray(final_st.e_bullet_map)
    )


def test_fused_seaquest_interpret_exactness():
    """Seaquest fused rollout (PRNG off) with hand-placed fish, a shooting
    enemy sub, a diver, and a friendly bullet mid-flight: obs, actions,
    rewards (kills land), dones, and scalar state match the XLA engine
    exactly over 20 steps. Pool-slot identity can permute under different
    RNG, so pool arrays are compared at the obs level."""
    import numpy as np
    from purejaxql_tpu.envs import make
    from purejaxql_tpu.models.cnn import CNNQNetwork
    from purejaxql_tpu.ops.pallas_rollout import (
        seaquest_from_state_matrix,
        seaquest_rollout_pallas,
        state_matrix_from_seaquest,
    )

    B, T = 16, 20
    env, params = make("Seaquest-MinAtar")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    obs0, state0 = jax.vmap(env.reset, in_axes=(0, None))(keys, params)
    state0 = state0.replace(
        spawn_timer=jnp.full((B,), 60, jnp.int32),
        diver_spawn_timer=jnp.full((B,), 60, jnp.int32),
        sub_y=jnp.full((B,), 4, jnp.int32),
        surfaced=jnp.zeros((B,), bool),
        f_exists=jnp.zeros((B, 8), bool).at[:, 0].set(True).at[:, 3].set(True),
        f_x=jnp.zeros((B, 8), jnp.int32).at[:, 0].set(2).at[:, 3].set(8),
        f_y=jnp.zeros((B, 8), jnp.int32).at[:, 0].set(6).at[:, 3].set(6),
        f_dir=jnp.ones((B, 8), jnp.int32).at[:, 3].set(-1),
        s_exists=jnp.zeros((B, 4), bool).at[:, 1].set(True),
        s_x=jnp.zeros((B, 4), jnp.int32).at[:, 1].set(9),
        s_y=jnp.zeros((B, 4), jnp.int32).at[:, 1].set(3),
        s_dir=jnp.ones((B, 4), jnp.int32).at[:, 1].set(-1),
        s_shot_timer=jnp.full((B, 4), 2, jnp.int32),
        fb_exists=jnp.zeros((B, 4), bool).at[:, 2].set(True),
        fb_x=jnp.zeros((B, 4), jnp.int32).at[:, 2].set(0),
        fb_y=jnp.zeros((B, 4), jnp.int32).at[:, 2].set(6),
        fb_dir=jnp.ones((B, 4), jnp.int32),
        d_exists=jnp.zeros((B, 4), bool).at[:, 2].set(True),
        d_x=jnp.zeros((B, 4), jnp.int32).at[:, 2].set(5),
        d_y=jnp.zeros((B, 4), jnp.int32).at[:, 2].set(5),
    )
    net = CNNQNetwork(action_dim=6, norm_type="layer_norm", norm_input=False)
    variables = net.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 10, 10, 10)), train=False
    )

    def ref_step(carry, _):
        obs, st = carry
        q = net.apply(variables, obs, train=False)
        a = jnp.argmax(q, axis=-1)
        o2, st2, r, d, _ = jax.vmap(env.step, in_axes=(0, 0, 0, None))(
            jax.random.split(jax.random.PRNGKey(2), B), st, a, params
        )
        return (o2, st2), (obs, a, r, d)

    obs_init = jax.vmap(lambda s: env.get_obs(s, params))(state0)
    (_, final_st), (obs_ref, act_ref, rew_ref, done_ref) = jax.lax.scan(
        ref_step, (obs_init, state0), None, T
    )
    assert np.asarray(rew_ref).sum() > 0  # the placed bullet scores kills
    st0 = state_matrix_from_seaquest(state0)
    obs_seq, act, rew, done_i, _, _, st1 = seaquest_rollout_pallas(
        jnp.asarray(0), jnp.asarray(0.0), variables["params"], st0,
        T, use_prng=False, interpret=True,
    )
    assert np.allclose(np.asarray(obs_seq), np.asarray(obs_ref))
    assert np.array_equal(np.asarray(act), np.asarray(act_ref))
    assert np.array_equal(np.asarray(rew), np.asarray(rew_ref))
    assert np.array_equal(
        np.asarray(done_i).astype(bool), np.asarray(done_ref)
    )
    q2 = seaquest_from_state_matrix(st1)
    for f in ("sub_x", "sub_y", "oxygen", "divers", "time", "spawn_timer"):
        assert np.array_equal(
            np.asarray(getattr(q2, f)), np.asarray(getattr(final_st, f))
        ), f


def test_fused_eval_episode_accounting(monkeypatch):
    """The fused in-graph eval (pqn.get_test_metrics with FUSED_ROLLOUT)
    chunks the greedy rollout through the kernel and replays episode stats
    from the (reward, done) streams. Stub the kernel with a synthetic
    stream — reward 1 every step, done at local step 5 of every chunk —
    and pin the resulting means exactly."""
    from purejaxql_tpu.algo import pqn as pqn_mod
    from purejaxql_tpu.core.config import compose

    CHUNK, B = 8, 4

    def fake_rollout(env_name, seed, eps, params, env_state, T, **kw):
        assert T == CHUNK
        rew = jnp.ones((T, B), jnp.float32)
        done = (
            (jnp.arange(T) == 5).astype(jnp.int32)[:, None]
            * jnp.ones((1, B), jnp.int32)
        )
        zero_obs = jnp.zeros((T, B, 10, 10, 4), jnp.float32)
        q = jnp.zeros((T, B, 8), jnp.float32)
        fobs = jnp.zeros((B, 10, 10, 4), jnp.float32)
        act = jnp.zeros((T, B), jnp.int32)
        return zero_obs, act, rew, done, q, fobs, env_state

    monkeypatch.setattr(pqn_mod, "fused_game_rollout", fake_rollout)
    config = compose(
        alg="pqn_minatar",
        overrides=[
            "ENV_NAME=Breakout-MinAtar",
            "TOTAL_TIMESTEPS=512", "TOTAL_TIMESTEPS_DECAY=512",
            f"NUM_ENVS={B}", f"NUM_STEPS={CHUNK}",
            "NUM_MINIBATCHES=1", "NUM_EPOCHS=1",
            "TEST_DURING_TRAINING=True", f"TEST_NUM_ENVS={B}",
            "TEST_NUM_STEPS=24", "TEST_INTERVAL=0.01",
            "FUSED_ROLLOUT=True", "COLLECT_METRICS=True",
        ],
    )
    outs = jax.block_until_ready(
        jax.jit(pqn_mod.make_train(config))(jax.random.PRNGKey(0))
    )
    rets = np.asarray(outs["metrics"]["test/returned_episode_returns"])
    lens = np.asarray(outs["metrics"]["test/returned_episode_lengths"])
    # chunked stream: done at global steps 5, 13, 21 -> episode lengths
    # 6, 8, 8 (first episode starts at reset). Mean return == mean length
    # == (6 + 8 + 8) / 3.
    expected = (6 + 8 + 8) / 3
    assert np.allclose(rets[-1], expected), rets
    assert np.allclose(lens[-1], expected), lens


def test_fused_eval_early_exit_first_episode_latch(monkeypatch):
    """EVAL_EARLY_EXIT stops the chunked eval once every env has finished
    an episode: with the synthetic done-at-step-5 stream, only chunk 0
    executes, so the estimator sees exactly one 6-step episode per env
    (the plain scan sees episodes of length 6, 8, 8 -> mean 22/3)."""
    from purejaxql_tpu.algo import pqn as pqn_mod
    from purejaxql_tpu.core.config import compose

    CHUNK, B = 8, 4

    def fake_rollout(env_name, seed, eps, params, env_state, T, **kw):
        rew = jnp.ones((T, B), jnp.float32)
        done = (
            (jnp.arange(T) == 5).astype(jnp.int32)[:, None]
            * jnp.ones((1, B), jnp.int32)
        )
        zero_obs = jnp.zeros((T, B, 10, 10, 4), jnp.float32)
        q = jnp.zeros((T, B, 8), jnp.float32)
        fobs = jnp.zeros((B, 10, 10, 4), jnp.float32)
        act = jnp.zeros((T, B), jnp.int32)
        return zero_obs, act, rew, done, q, fobs, env_state

    monkeypatch.setattr(pqn_mod, "fused_game_rollout", fake_rollout)
    config = compose(
        alg="pqn_minatar",
        overrides=[
            "ENV_NAME=Breakout-MinAtar",
            "TOTAL_TIMESTEPS=512", "TOTAL_TIMESTEPS_DECAY=512",
            f"NUM_ENVS={B}", f"NUM_STEPS={CHUNK}",
            "NUM_MINIBATCHES=1", "NUM_EPOCHS=1",
            "TEST_DURING_TRAINING=True", f"TEST_NUM_ENVS={B}",
            "TEST_NUM_STEPS=24", "TEST_INTERVAL=0.01",
            "FUSED_ROLLOUT=True", "COLLECT_METRICS=True",
            "EVAL_EARLY_EXIT=True",
        ],
    )
    outs = jax.block_until_ready(
        jax.jit(pqn_mod.make_train(config))(jax.random.PRNGKey(0))
    )
    rets = np.asarray(outs["metrics"]["test/returned_episode_returns"])
    lens = np.asarray(outs["metrics"]["test/returned_episode_lengths"])
    assert np.allclose(rets[-1], 6.0), rets
    assert np.allclose(lens[-1], 6.0), lens


def test_fused_eval_interpret_end_to_end():
    """Interpret-mode smoke of the fused eval on real Breakout: the whole
    make_train compiles and the eval produces the episode-metric keys."""
    from functools import partial

    from purejaxql_tpu.algo import pqn as pqn_mod
    from purejaxql_tpu.core.config import compose

    real = pqn_mod.fused_game_rollout
    pqn_mod.fused_game_rollout = partial(real, use_prng=False, interpret=True)
    try:
        config = compose(
            alg="pqn_minatar",
            overrides=[
                "ENV_NAME=Breakout-MinAtar",
                "TOTAL_TIMESTEPS=256", "TOTAL_TIMESTEPS_DECAY=256",
                "NUM_ENVS=8", "NUM_STEPS=8",
                "NUM_MINIBATCHES=1", "NUM_EPOCHS=1",
                "TEST_DURING_TRAINING=True", "TEST_NUM_ENVS=8",
                "TEST_NUM_STEPS=16", "TEST_INTERVAL=0.01",
                "FUSED_ROLLOUT=True", "COLLECT_METRICS=True",
            ],
        )
        outs = jax.block_until_ready(
            jax.jit(pqn_mod.make_train(config))(jax.random.PRNGKey(0))
        )
    finally:
        pqn_mod.fused_game_rollout = real
    m = outs["metrics"]
    assert "test/returned_episode_returns" in m
    assert "test/returned_episode" in m
    # rewards are bounded in Breakout: any finished-episode mean is finite
    # or NaN (no episode finished) — never inf
    assert not np.isinf(np.asarray(m["test/returned_episode_returns"])).any()


def test_fused_pendulum_interpret_exactness():
    """Pendulum AC fused rollout (PRNG off => greedy, no resets in 12
    steps) matches the XLA engine's actor, critic-ensemble value, physics,
    rewards, and final state exactly."""
    import numpy as np
    from purejaxql_tpu.envs import make
    from purejaxql_tpu.models.actor_critic import Actor, Critic
    from purejaxql_tpu.ops.pallas_rollout import (
        pendulum_ac_rollout_pallas,
        pendulum_from_state_matrix,
        state_matrix_from_pendulum,
    )

    B, T, H = 16, 12, 64
    env, params = make("Pendulum-v1")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    obs0, state0 = jax.vmap(env.reset, in_axes=(0, None))(keys, params)

    actor = Actor(
        1, action_scale=jnp.asarray(2.0), action_bias=jnp.asarray(0.0),
        hidden_sizes=(H, H), norm_type="layer_norm",
    )
    av = actor.init(jax.random.PRNGKey(1), jnp.zeros(3))
    critic = Critic(hidden_sizes=(H, H), norm_type="layer_norm")
    cv = jax.vmap(critic.init, in_axes=(0, None, None))(
        jax.random.split(jax.random.PRNGKey(2), 2), jnp.zeros(3),
        jnp.zeros(1),
    )

    def ref_step(carry, _):
        obs, st = carry
        a = actor.apply(av, obs, train=False)
        v = jax.vmap(lambda p: critic.apply(p, obs, a, train=False))(
            cv
        ).mean(0)
        o2, st2, r, d, _ = jax.vmap(env.step_env, in_axes=(0, 0, 0, None))(
            jax.random.split(jax.random.PRNGKey(3), B), st, a, params
        )
        return (o2, st2), (obs, a, v, r, d)

    (_, final_st), (obs_r, act_r, val_r, rew_r, done_r) = jax.lax.scan(
        ref_step, (obs0, state0), None, T
    )
    assert not np.asarray(done_r).any()

    stf0, sti0 = state_matrix_from_pendulum(state0)
    obs_s, u, greedy, value, rew, done, fobs, stf1, sti1 = (
        pendulum_ac_rollout_pallas(
            jnp.asarray(0), jnp.asarray(0.0), av["params"], cv["params"],
            stf0, sti0, T, use_prng=False, interpret=True,
        )
    )
    assert np.allclose(np.asarray(obs_s), np.asarray(obs_r), atol=1e-5)
    assert np.allclose(np.asarray(u), np.asarray(act_r), atol=1e-5)
    assert np.allclose(np.asarray(value), np.asarray(val_r), atol=1e-5)
    assert np.allclose(np.asarray(rew), np.asarray(rew_r), atol=1e-5)
    ps = pendulum_from_state_matrix(stf1, sti1)
    for f in ("theta", "theta_dot", "last_u"):
        assert np.allclose(
            np.asarray(getattr(ps, f)), np.asarray(getattr(final_st, f)),
            atol=1e-5,
        ), f
    assert np.array_equal(np.asarray(ps.time), np.asarray(final_st.time))


def test_fused_ac_train_interpret_end_to_end():
    """Interpret-mode smoke of the whole fused AC trainer on Pendulum:
    make_train(FUSED_ROLLOUT=True) compiles, trains, evals, and the LogVec
    episode replay produces finite episode metrics."""
    from functools import partial

    from purejaxql_tpu.algo import pqn_ac as ac_mod
    from purejaxql_tpu.core.config import compose

    real = ac_mod.fused_pendulum_rollout
    ac_mod.fused_pendulum_rollout = partial(
        real, use_prng=False, interpret=True
    )
    try:
        config = compose(
            alg="pqn_pendulum",
            overrides=[
                "TOTAL_TIMESTEPS=512", "NUM_ENVS=8", "NUM_STEPS=16",
                "NUM_MINIBATCHES=2", "NUM_EPOCHS=1",
                "ACTOR_HIDDEN_SIZES=[32,32]", "CRITIC_HIDDEN_SIZES=[32,32]",
                "TEST_DURING_TRAINING=True", "TEST_NUM_ENVS=8",
                "TEST_NUM_STEPS=32", "TEST_INTERVAL=0.01",
                "FUSED_ROLLOUT=True", "COLLECT_METRICS=True",
            ],
        )
        outs = jax.block_until_ready(
            jax.jit(ac_mod.make_train(config))(jax.random.PRNGKey(0))
        )
    finally:
        ac_mod.fused_pendulum_rollout = real
    m = outs["metrics"]
    assert np.isfinite(np.asarray(m["value_loss"])).all()
    assert np.isfinite(np.asarray(m["loss_actor"])).all()
    assert "test/returned_episode_returns" in m
    # LogVec replay: per-update timestep counters advance by NUM_STEPS
    ts = np.asarray(m["timestep"])
    assert ts.ndim >= 1 and (np.diff(ts.reshape(ts.shape[0], -1).mean(1)) > 0).all()
