"""MiniHanabi (Hanabi-class imperfect-information MARL) tests: turn
masks, hint knowledge propagation, play/misplay dynamics, conservation
invariants, termination, and VDN-RNN training over the env."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose
from purejaxql_tpu.envs.marl import make_marl
from purejaxql_tpu.envs.marl.base import CTRolloutManager, MARLLogWrapper
from purejaxql_tpu.algo.pqn_vdn import make_train


def _mk(**kw):
    return make_marl("MiniHanabi-v0", **kw)


def _step_action(env, state, action_idx, key=0):
    """Step with the current player taking action_idx, the other nooping."""
    cur = int(state.cur_player)
    acts = {
        env.agents[cur]: jnp.asarray(action_idx),
        env.agents[1 - cur]: jnp.asarray(env.A_NOOP),
    }
    return env.step(jax.random.PRNGKey(key), state, acts)


def test_shapes_and_reset():
    env = _mk()
    obs, state = env.reset(jax.random.PRNGKey(0))
    assert env.num_actions == 2 * env.H + env.C + env.R + 1
    for a in env.agents:
        assert obs[a].shape == (env.obs_dim,)
        assert np.isfinite(np.asarray(obs[a])).all()
    # both hands dealt, deck pointer past them
    assert (np.asarray(state.hands) >= 0).all()
    assert int(state.deck_ptr) == 2 * env.H


def test_turn_based_masks():
    env = _mk()
    _, state = env.reset(jax.random.PRNGKey(0))
    masks = env.get_avail_actions(state)
    m0 = np.asarray(masks["agent_0"])
    m1 = np.asarray(masks["agent_1"])
    # off-turn agent: noop only
    assert m1[env.A_NOOP] == 1.0 and m1[: env.A_NOOP].sum() == 0
    # on-turn agent: noop masked, plays legal, discards illegal at max info
    assert m0[env.A_NOOP] == 0.0
    assert (m0[env.H : 2 * env.H] == 1.0).all()  # play actions
    assert (m0[: env.H] == 0.0).all()  # discard at 8/8 info tokens
    # at least one hint about the partner's actual hand is legal
    assert m0[2 * env.H :].sum() >= 1.0


def test_hint_color_updates_knowledge():
    env = _mk()
    _, state = env.reset(jax.random.PRNGKey(3))
    partner = 1 - int(state.cur_player)
    p_cards = np.asarray(state.hands[partner])
    c = int(p_cards[0]) // env.R  # a color the partner certainly holds
    _, state2, _, _, _ = _step_action(env, state, 2 * env.H + c)
    kc = np.asarray(state2.know_color[partner])
    for h in range(env.H):
        if p_cards[h] // env.R == c:
            # positively identified: only color c possible
            assert kc[h, c] == 1 and kc[h].sum() == 1
        else:
            # negatively eliminated
            assert kc[h, c] == 0
    # a hint costs one info token
    assert int(state2.info_tokens) == env.max_info - 1


def test_hint_rank_updates_knowledge():
    env = _mk()
    _, state = env.reset(jax.random.PRNGKey(4))
    partner = 1 - int(state.cur_player)
    p_cards = np.asarray(state.hands[partner])
    r = int(p_cards[1]) % env.R
    _, state2, _, _, _ = _step_action(env, state, 2 * env.H + env.C + r)
    kr = np.asarray(state2.know_rank[partner])
    for h in range(env.H):
        if p_cards[h] % env.R == r:
            assert kr[h, r] == 1 and kr[h].sum() == 1
        else:
            assert kr[h, r] == 0


def test_play_success_and_misplay():
    env = _mk()
    _, state = env.reset(jax.random.PRNGKey(0))
    cur = int(state.cur_player)
    # force a known hand: slot0 = color0 rank0 (playable), slot1 = color0
    # rank4 (unplayable on an empty stack)
    hands = state.hands.at[cur, 0].set(0).at[cur, 1].set(env.R - 1)
    state = state.replace(hands=hands)

    _, s_ok, rew, _, info = _step_action(env, state, env.H + 0)
    assert float(rew["__all__"]) == 1.0
    assert int(s_ok.fireworks[0]) == 1
    assert int(s_ok.lives) == env.max_lives
    assert int(info["score"]) == 1
    # turn passed to the partner
    assert int(s_ok.cur_player) == 1 - cur

    _, s_bad, rew, _, _ = _step_action(env, state, env.H + 1)
    assert float(rew["__all__"]) == 0.0
    assert int(s_bad.lives) == env.max_lives - 1
    assert int(s_bad.fireworks[0]) == 0
    assert int(np.asarray(s_bad.discards).sum()) == 1


def test_discard_refunds_token_and_redraws():
    env = _mk()
    _, state = env.reset(jax.random.PRNGKey(1))
    # spend a hint so a discard is legal, then discard slot 2
    _, state, _, _, _ = _step_action(env, state, 2 * env.H)  # some color hint
    cur = int(state.cur_player)
    before_ptr = int(state.deck_ptr)
    expected_draw = int(state.deck[before_ptr])
    _, s2, _, _, _ = _step_action(env, state, 2)
    assert int(s2.info_tokens) == env.max_info  # refunded back to max
    assert int(s2.deck_ptr) == before_ptr + 1
    assert int(s2.hands[cur, 2]) == expected_draw
    # redrawn slot's knowledge is reset to all-possible
    assert np.asarray(s2.know_color[cur, 2]).all()
    assert np.asarray(s2.know_rank[cur, 2]).all()


def test_conservation_and_termination():
    """Across a random-legal rollout every card is always in exactly one
    place: hands + undrawn deck + discard pile + fireworks stacks."""
    env = _mk()
    wrapped = CTRolloutManager(MARLLogWrapper(env), batch_size=8)
    rng = jax.random.PRNGKey(2)
    obs, st = wrapped.batch_reset(rng)

    @jax.jit
    def body(carry, _):
        rng, st = carry
        rng, k1, k2 = jax.random.split(rng, 3)
        masks = wrapped.get_valid_actions(st)
        acts = {
            a: jax.random.categorical(
                jax.random.fold_in(k1, i),
                jnp.where(masks[a] > 0, 0.0, -1e9),
                axis=-1,
            )
            for i, a in enumerate(env.agents)
        }
        obs, st, rew, dones, info = wrapped.batch_step(k2, st, acts)
        raw = st[0]  # unwrap MARLLogWrapper state
        in_hands = (raw.hands >= 0).sum(axis=(1, 2))
        in_deck = env.deck_size - raw.deck_ptr
        in_pile = raw.discards.sum(axis=(1, 2))
        played = raw.fireworks.sum(axis=1)
        total = in_hands + in_deck + in_pile + played
        return (rng, st), (total, dones["__all__"])

    (_, st), (totals, dones) = jax.lax.scan(body, (rng, st), None, 300)
    np.testing.assert_array_equal(np.asarray(totals), env.deck_size)
    # 8 envs x 300 turns: every env terminates (and auto-resets) many times
    assert np.asarray(dones).sum() > 8


def test_lives_exhaustion_ends_episode():
    env = _mk()
    _, state = env.reset(jax.random.PRNGKey(0))
    state = state.replace(lives=jnp.asarray(1, jnp.int32))
    cur = int(state.cur_player)
    # force an unplayable card and play it
    hands = state.hands.at[cur, 0].set(env.R - 1)
    state = state.replace(hands=hands)
    _, s2, _, dones, _ = _step_action(env, state, env.H + 0)
    assert bool(dones["__all__"])
    assert int(s2.time) == 0  # auto-reset fired


def test_vdn_trains_on_hanabi():
    config = compose(
        alg="pqn_vdn_hanabi",
        overrides=[
            "TOTAL_TIMESTEPS=16384", "TOTAL_TIMESTEPS_DECAY=16384",
            "NUM_ENVS=16", "NUM_STEPS=32", "MEMORY_WINDOW=4",
            "NUM_MINIBATCHES=2", "NUM_EPOCHS=1", "HIDDEN_SIZE=32",
            "TEST_DURING_TRAINING=False",
        ],
    )
    outs = jax.block_until_ready(
        jax.jit(make_train(config))(jax.random.PRNGKey(0))
    )
    assert np.isfinite(np.asarray(outs["metrics"]["td_loss"])).all()


@pytest.mark.slow
def test_vdn_learns_hanabi():
    """Learning evidence: team score improves over the random-legal-play
    baseline (~1.2 fireworks) under VDN-RNN-PQN."""
    config = compose(
        alg="pqn_vdn_hanabi",
        overrides=[
            "TOTAL_TIMESTEPS=2000000", "TOTAL_TIMESTEPS_DECAY=2000000",
            "NUM_ENVS=64", "TEST_NUM_ENVS=32", "TEST_DURING_TRAINING=False",
        ],
    )
    outs = jax.block_until_ready(
        jax.jit(make_train(config))(jax.random.PRNGKey(0))
    )
    rets = np.asarray(outs["metrics"]["returned_episode_returns"])
    early = rets[: len(rets) // 10].mean()
    late = rets[-len(rets) // 10 :].mean()
    assert late > early + 0.5 and late > 2.0, (early, late)
