"""Ecosystem adapters (envs/external.py): the registry falls through to
installed gymnax/craftax/jaxmarl. The real packages aren't installable in
this image, so the adapters are exercised against faithful fakes injected
into sys.modules — same call signatures, same return structures — plus a
full PQN training smoke through the adapted env."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import struct

from purejaxql_tpu.envs import spaces as our_spaces


# ---------------------------------------------------------------- fakes


@struct.dataclass
class _FakeParams:
    max_steps_in_episode: int = struct.field(pytree_node=False, default=20)


@struct.dataclass
class _FakeState:
    x: jax.Array
    time: jax.Array


class _FakeDiscrete:
    def __init__(self, n):
        self.n = n


class _FakeBox:
    def __init__(self, low, high, shape, dtype=np.float32):
        self.low, self.high, self.shape, self.dtype = low, high, shape, dtype


class _FakeGymnaxEnv:
    """Mimics gymnax.environments.environment.Environment: reset_env /
    step_env split, auto-reset composed outside, spaces with .n/.shape."""

    name = "FakeCart-v9"

    @property
    def default_params(self):
        return _FakeParams()

    def reset_env(self, key, params):
        x = jax.random.uniform(key, (3,), minval=-0.05, maxval=0.05)
        state = _FakeState(x=x, time=jnp.asarray(0, jnp.int32))
        return x.astype(jnp.float32), state

    def step_env(self, key, state, action, params):
        x = state.x + 0.1 * (jnp.asarray(action, jnp.float32) - 1.0)
        ns = _FakeState(x=x, time=state.time + 1)
        reward = 1.0 - jnp.abs(x).mean()
        done = ns.time >= params.max_steps_in_episode
        return (
            x.astype(jnp.float32),
            ns,
            jnp.asarray(reward, jnp.float32),
            done,
            {"discount": 1.0 - done},
        )

    def observation_space(self, params):
        return _FakeBox(-np.inf, np.inf, (3,))

    def action_space(self, params=None):
        return _FakeDiscrete(3)


def _install_fake_gymnax(monkeypatch):
    mod = types.ModuleType("gymnax")

    def make(name, **kwargs):
        if name != "FakeCart-v9":
            raise ValueError(name)
        env = _FakeGymnaxEnv()
        return env, env.default_params

    mod.make = make
    monkeypatch.setitem(sys.modules, "gymnax", mod)


# ---------------------------------------------------------------- tests


def test_registry_falls_through_to_gymnax(monkeypatch):
    _install_fake_gymnax(monkeypatch)
    from purejaxql_tpu.envs import make

    env, params = make("FakeCart-v9")
    assert env.name == "FakeCart-v9"
    obs_sp = env.observation_space(params)
    act_sp = env.action_space(params)
    assert isinstance(obs_sp, our_spaces.Box) and obs_sp.shape == (3,)
    assert isinstance(act_sp, our_spaces.Discrete) and act_sp.n == 3

    # the in-tree auto-reset protocol drives the adapted env
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key, params)
    for t in range(25):
        obs, state, r, d, info = env.step(
            jax.random.fold_in(key, t), state, jnp.asarray(1), params
        )
    # past max_steps the episode auto-reset: inner clock restarted
    assert int(state.time) < 20
    assert np.isfinite(np.asarray(obs)).all()


def test_in_tree_names_still_win(monkeypatch):
    """An installed gymnax must NOT shadow in-tree envs."""
    calls = []
    mod = types.ModuleType("gymnax")

    def make(name, **kwargs):
        calls.append(name)
        raise ValueError(name)

    mod.make = make
    monkeypatch.setitem(sys.modules, "gymnax", mod)
    from purejaxql_tpu.envs import make as our_make
    from purejaxql_tpu.envs.classic.cartpole import CartPole

    env, params = our_make("CartPole-v1")
    assert isinstance(env, CartPole)
    assert calls == []  # fallthrough never consulted


def test_unknown_env_error_mentions_ecosystem(monkeypatch):
    from purejaxql_tpu.envs import make

    with pytest.raises(ValueError, match="ecosystem"):
        make("DefinitelyNotAnEnv-v99")


def test_pqn_trains_on_adapted_env(monkeypatch):
    """Full PQN training through the adapter — the reference configs work
    against a pip suite unchanged."""
    _install_fake_gymnax(monkeypatch)
    from purejaxql_tpu.core.config import compose
    from purejaxql_tpu.algo.pqn import make_train

    config = compose(
        alg="pqn_cartpole",
        overrides=[
            "ENV_NAME=FakeCart-v9",
            "TOTAL_TIMESTEPS=2048", "TOTAL_TIMESTEPS_DECAY=2048",
            "NUM_ENVS=8", "NUM_STEPS=16", "NUM_MINIBATCHES=2",
            "NUM_EPOCHS=1", "HIDDEN_SIZE=32",
            "TEST_DURING_TRAINING=False", "COLLECT_METRICS=False",
        ],
    )
    out = jax.block_until_ready(
        jax.jit(make_train(config))(jax.random.PRNGKey(0))
    )
    assert int(out["runner_state"][0].timesteps) == 2048


def test_marl_falls_through_to_jaxmarl(monkeypatch):
    """A fake jaxmarl env (the protocol IS our MultiAgentEnv protocol)
    resolves through make_marl and steps under the CTRolloutManager."""
    from purejaxql_tpu.envs.marl.base import MultiAgentEnv

    class FakeMPE(MultiAgentEnv):
        def __init__(self):
            self.agents = ["agent_0", "agent_1"]
            self.num_agents = 2

        def reset(self, key):
            obs = {a: jnp.zeros(4) for a in self.agents}
            return obs, jnp.asarray(0, jnp.int32)

        def step(self, key, state, actions):
            state = state + 1
            obs = {
                a: jnp.full(4, state, jnp.float32) / 10.0
                for a in self.agents
            }
            rewards = {a: jnp.asarray(1.0) for a in self.agents}
            rewards["__all__"] = jnp.asarray(2.0)
            done = state >= 5
            dones = {a: done for a in self.agents}
            dones["__all__"] = done
            # auto-reset
            state = jnp.where(done, 0, state)
            return obs, state, rewards, dones, {}

        def observation_space(self, agent):
            return our_spaces.Box(-np.inf, np.inf, (4,), np.float32)

        def action_space(self, agent):
            return our_spaces.Discrete(3)

    mod = types.ModuleType("jaxmarl")

    def jm_make(name, **kwargs):
        if name != "MPE_simple_fake_v9":
            raise ValueError(name)
        return FakeMPE()

    mod.make = jm_make
    monkeypatch.setitem(sys.modules, "jaxmarl", mod)

    from purejaxql_tpu.envs.marl import make_marl
    from purejaxql_tpu.envs.marl.base import CTRolloutManager

    env = make_marl("MPE_simple_fake_v9")
    mgr = CTRolloutManager(env, batch_size=4)
    key = jax.random.PRNGKey(0)
    obs, state = mgr.batch_reset(key)
    actions = {a: jnp.zeros(4, jnp.int32) for a in env.agents}
    obs, state, rew, dones, info = mgr.batch_step(key, state, actions)
    assert rew["__all__"].shape == (4,)
    assert np.isfinite(np.asarray(obs["agent_0"])).all()
