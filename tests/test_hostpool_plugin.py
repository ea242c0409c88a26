"""The envhost plug-in ABI: an external game .so compiled at test time
loads into the pool service and trains through the unchanged pqn_host
engine (docs/ENVHOST_PLUGIN.md — the EnvPool-extension role)."""

import os
import shutil
import subprocess
import textwrap

import jax
import numpy as np
import pytest

from purejaxql_tpu.core.config import compose

pytestmark = pytest.mark.skipif(
    shutil.which("make") is None or shutil.which("g++") is None,
    reason="native toolchain unavailable",
)

# A tiny deterministic-dynamics game ("Bandit walk"): state t counts 0..7;
# action 1 at even t pays +1, action 0 at odd t pays +1; obs is
# [t/8, parity]. Optimal return per 8-step episode = 8. Seeded start phase
# exercises the per-instance seed plumbing.
_PLUGIN_SRC = r"""
#include <cstdint>
#include <cstring>

extern "C" {
typedef struct EhPluginVTable {
  const char* name;
  int32_t obs_dim;
  int32_t num_actions;
  int32_t obs_rank;
  int32_t obs_shape[3];
  void* (*create)(uint64_t seed);
  void (*destroy)(void* env);
  void (*reset)(void* env, float* obs);
  void (*step)(void* env, int32_t action, float* obs, float* reward,
               uint8_t* done);
} EhPluginVTable;
}

namespace {
struct Walk {
  int t = 0;
  int phase = 0;
};

void write_obs(const Walk* w, float* obs) {
  obs[0] = static_cast<float>(w->t) / 8.0f;
  obs[1] = static_cast<float>((w->t + w->phase) % 2);
}

void* wcreate(uint64_t seed) {
  Walk* w = new Walk();
  w->phase = static_cast<int>(seed % 2);
  return w;
}
void wdestroy(void* env) { delete static_cast<Walk*>(env); }
void wreset(void* env, float* obs) {
  Walk* w = static_cast<Walk*>(env);
  w->t = 0;
  write_obs(w, obs);
}
void wstep(void* env, int32_t action, float* obs, float* reward,
           uint8_t* done) {
  Walk* w = static_cast<Walk*>(env);
  int good = ((w->t + w->phase) % 2 == 0) ? 1 : 0;
  *reward = (action == good) ? 1.0f : 0.0f;
  w->t += 1;
  if (w->t >= 8) {
    *done = 1;
    w->t = 0;
  } else {
    *done = 0;
  }
  write_obs(w, obs);
}
}  // namespace

extern "C" int eh_plugin_get(EhPluginVTable* out) {
  out->name = "BanditWalk-plugin";
  out->obs_dim = 2;
  out->num_actions = 2;
  out->obs_rank = 1;
  out->obs_shape[0] = 2;
  out->create = wcreate;
  out->destroy = wdestroy;
  out->reset = wreset;
  out->step = wstep;
  return 0;
}
"""


@pytest.fixture(scope="module")
def plugin_so(tmp_path_factory):
    d = tmp_path_factory.mktemp("ehplugin")
    src = d / "banditwalk.cc"
    src.write_text(textwrap.dedent(_PLUGIN_SRC))
    so = d / "libbanditwalk.so"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-o",
         os.fspath(so), os.fspath(src)],
        check=True,
    )
    return os.fspath(so)


def test_plugin_loads_and_steps(plugin_so):
    from purejaxql_tpu.envs.hostpool import HostEnvPool, load_plugin

    load_plugin(plugin_so)
    pool = HostEnvPool("BanditWalk-plugin", num_envs=8, seed=0)
    assert pool.num_actions == 2
    assert pool.obs_shape == (2,)
    obs = pool.reset()
    assert obs.shape == (8, 2)
    # play optimally: action = parity bit of the obs
    total = np.zeros(8)
    for _ in range(8):
        act = (1 - obs[:, 1]).astype(np.int32)  # good when (t+phase)%2==0
        obs, rew, done = pool.step(act)[:3]
        total += rew
    assert (total == 8).all(), total   # perfect play scores 8/episode
    pool.close()


def test_plugin_bad_path_raises():
    from purejaxql_tpu.envs.hostpool import load_plugin

    with pytest.raises(ValueError, match="dlopen"):
        load_plugin("/nonexistent/libnope.so")


def test_plugin_trains_through_pqn_host(plugin_so):
    """The unchanged host engine learns the parity policy on the plug-in
    game (reward/step -> ~1 when learned, 0.5 random)."""
    from purejaxql_tpu.algo.pqn_host import make_train
    from purejaxql_tpu.envs.hostpool import load_plugin

    load_plugin(plugin_so)
    config = compose(
        alg="pqn_cartpole",
        overrides=[
            "ENV_NAME=BanditWalk-plugin",
            "TOTAL_TIMESTEPS=65536", "TOTAL_TIMESTEPS_DECAY=65536",
            "NUM_ENVS=32", "NUM_STEPS=16", "NUM_MINIBATCHES=2",
            "NUM_EPOCHS=2", "HIDDEN_SIZE=32", "REW_SCALE=1.0",
            "LR=0.003", "EPS_FINISH=0.05", "EPS_DECAY=0.3",
            "TEST_DURING_TRAINING=True", "TEST_ENVS=8",
        ],
    )
    outs = jax.block_until_ready(
        jax.jit(make_train(config))(jax.random.PRNGKey(0))
    )
    m = outs["metrics"]
    # greedy inline eval envs clear the random baseline (4/8 per episode;
    # the mechanism matters here, not PQN's sample efficiency on the toy)
    rets = np.asarray(m["test/returned_episode_returns"])
    assert rets[-8:].mean() > 4.6, rets[::16]
    assert rets[-8:].mean() > rets[:8].mean() + 1.0, rets[::16]
