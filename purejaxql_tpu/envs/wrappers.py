"""Environment wrappers: the full wrapper inventory of the reference, rebuilt.

Covers (reference citations into /root/reference/purejaxql/):
- FlattenObservation  (gymnax.wrappers.purerl used at pqn_gymnax.py:93)
- Log                 (episode-return/length accounting, pqn_gymnax.py:94,
                       utils/craftax_wrappers.py:151-200)
- BatchEnv            (internal vmap over num_envs, utils/craftax_wrappers.py:21-45)
- AutoReset           (utils/craftax_wrappers.py:48-80; note our base
                       Environment.step already auto-resets — this wrapper
                       exists for envs exposing only reset_env/step_env raw)
- OptimisticResetVecEnv (utils/craftax_wrappers.py:83-148 — only
                       num_envs/reset_ratio reset computations per step,
                       shared across done envs)
- ClipAction, TransformObservation, TransformReward, VecEnv
                      (utils/brax_wrappers.py:275-321)
- NormalizeVecObservation, NormalizeVecReward (utils/brax_wrappers.py:335-566)
- LogVec              (utils/brax_wrappers.py:579-629)

All wrappers are pure pytree-state transformations and compile into the same
single XLA program as the env itself.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment, Wrapper


class FlattenObservation(Wrapper):
    """Flatten observations to 1-D vectors."""

    def reset(self, key, params=None):
        obs, state = self._env.reset(key, params)
        return obs.reshape(-1), state

    def step(self, key, state, action, params=None):
        obs, state, reward, done, info = self._env.step(key, state, action, params)
        return obs.reshape(-1), state, reward, done, info

    def observation_space(self, params):
        space = self._env.observation_space(params)
        n = int(np.prod(space.shape))
        return spaces.Box(
            np.asarray(space.low).reshape(-1) if np.ndim(space.low) else space.low,
            np.asarray(space.high).reshape(-1) if np.ndim(space.high) else space.high,
            (n,),
            space.dtype,
        )


@struct.dataclass
class LogEnvState:
    env_state: Any
    episode_returns: jax.Array
    episode_lengths: jax.Array
    returned_episode_returns: jax.Array
    returned_episode_lengths: jax.Array
    timestep: jax.Array


class Log(Wrapper):
    """Accumulate per-episode return/length; emit them in `info` on done."""

    def reset(self, key, params=None):
        obs, env_state = self._env.reset(key, params)
        zero_f = jnp.asarray(0.0)
        zero_i = jnp.asarray(0, jnp.int32)
        state = LogEnvState(env_state, zero_f, zero_i, zero_f, zero_i, zero_i)
        return obs, state

    def step(self, key, state, action, params=None):
        obs, env_state, reward, done, info = self._env.step(
            key, state.env_state, action, params
        )
        new_episode_return = state.episode_returns + reward
        new_episode_length = state.episode_lengths + 1
        not_done = (1 - done).astype(new_episode_return.dtype)
        not_done_i = (1 - done).astype(jnp.int32)
        state = LogEnvState(
            env_state=env_state,
            episode_returns=new_episode_return * not_done,
            episode_lengths=new_episode_length * not_done_i,
            returned_episode_returns=state.returned_episode_returns * not_done
            + new_episode_return * done,
            returned_episode_lengths=state.returned_episode_lengths * not_done_i
            + new_episode_length * done,
            timestep=state.timestep + 1,
        )
        info = dict(info)
        info["returned_episode_returns"] = state.returned_episode_returns
        info["returned_episode_lengths"] = state.returned_episode_lengths
        info["timestep"] = state.timestep
        info["returned_episode"] = done
        return obs, state, reward, done, info

    # Raw (non-auto-resetting) path so OptimisticResetVecEnv can manage
    # resets itself, mirroring the reference's auto_reset=False craftax env
    # under the optimistic wrapper (pqn_craftax.py:96-103).
    def reset_env(self, key, params):
        obs, env_state = self._env.reset_env(key, params)
        zero_f = jnp.asarray(0.0)
        zero_i = jnp.asarray(0, jnp.int32)
        state = LogEnvState(env_state, zero_f, zero_i, zero_f, zero_i, zero_i)
        return obs, state

    def step_env(self, key, state, action, params):
        obs, env_state, reward, done, info = self._env.step_env(
            key, state.env_state, action, params
        )
        new_episode_return = state.episode_returns + reward
        new_episode_length = state.episode_lengths + 1
        not_done = (1 - done).astype(new_episode_return.dtype)
        not_done_i = (1 - done).astype(jnp.int32)
        state = LogEnvState(
            env_state=env_state,
            episode_returns=new_episode_return * not_done,
            episode_lengths=new_episode_length * not_done_i,
            returned_episode_returns=state.returned_episode_returns * not_done
            + new_episode_return * done,
            returned_episode_lengths=state.returned_episode_lengths * not_done_i
            + new_episode_length * done,
            timestep=state.timestep + 1,
        )
        info = dict(info)
        info["returned_episode_returns"] = state.returned_episode_returns
        info["returned_episode_lengths"] = state.returned_episode_lengths
        info["timestep"] = state.timestep
        info["returned_episode"] = done
        return obs, state, reward, done, info


class BatchEnv(Wrapper):
    """vmap reset/step over `num_envs` with internal key splitting
    (reference: craftax_wrappers.py:21-45)."""

    def __init__(self, env: Environment, num_envs: int):
        super().__init__(env)
        self.num_envs = num_envs

    # Key discipline matches the reference exactly (split once, then fan
    # out the SECOND half over envs — craftax_wrappers.py:33-45), so batched
    # env streams are bitwise-identical to the reference's.
    def reset(self, key, params=None):
        key, _key = jax.random.split(key)
        keys = jax.random.split(_key, self.num_envs)
        return jax.vmap(self._env.reset, in_axes=(0, None))(keys, params)

    def step(self, key, state, action, params=None):
        key, _key = jax.random.split(key)
        keys = jax.random.split(_key, self.num_envs)
        return jax.vmap(self._env.step, in_axes=(0, 0, 0, None))(
            keys, state, action, params
        )


class AutoReset(Wrapper):
    """Gymnax-style auto-reset built from raw reset_env/step_env
    (reference: craftax_wrappers.py:48-80). Our base Environment.step already
    has this behavior; use this wrapper for external envs exposing only the
    raw transition."""

    def reset(self, key, params=None):
        return self._env.reset_env(key, params)

    def step(self, key, state, action, params=None):
        key, key_reset = jax.random.split(key)
        obs_st, state_st, reward, done, info = self._env.step_env(
            key, state, action, params
        )
        obs_re, state_re = self._env.reset_env(key_reset, params)
        state = jax.tree_util.tree_map(
            lambda re, st: jax.lax.select(done, re, st), state_re, state_st
        )
        obs = jax.lax.select(done, obs_re, obs_st)
        return obs, state, reward, done, info


def _scatter_resets(done, being_reset, resets, live):
    """Scatter `num_resets` candidate reset entries onto the done envs.

    O(num_resets) data traffic instead of the reference's O(num_envs)
    gather-expand + select (craftax_wrappers.py:125-148). When at most
    num_resets envs are done, this is value-identical to the expansion:
    EVERY done env is in `being_reset` (weighted sampling without
    replacement is Gumbel top-k — zero-probability envs rank below all
    done ones; verified property-style in tests/test_wrappers_extra.py).
    When MORE envs are done than candidates exist, the extras are
    DEFERRED: they re-fire `done` on the next step and get routed then
    (the done-weighted sampling favors them), instead of sharing a
    candidate world the same step. A lax.cond fallback to the expansion
    was measured SLOWER than expanding always (the cond forces the full
    live env-state tree through branch boundaries — ~80 MB of copies per
    step at the craftax config), so the fast path accepts the deferral;
    at craftax scale (~3-10 dones/step vs 64 candidates) it never fires.

    resets: pytree with leading dim num_resets; live: leading num_envs.
    """
    num_envs = done.shape[0]
    # non-done picks (arbitrary slots sampled off NaN/zero weights) are
    # dropped via an out-of-bounds index
    idx = jnp.where(done[being_reset], being_reset, num_envs)
    return jax.tree_util.tree_map(
        lambda st, re: st.at[idx].set(re, mode="drop"), live, resets
    )


class OptimisticResetVecEnv(Wrapper):
    """Batched env with shared resets: computes only num_envs/reset_ratio
    fresh reset states per step and routes them to done envs
    (reference: craftax_wrappers.py:83-148). The win: for expensive-reset
    envs (procedural worldgen) the reset cost amortizes by reset_ratio while
    the per-step semantics stay within one lax.select of exact auto-reset.
    """

    def __init__(self, env: Environment, num_envs: int, reset_ratio: int):
        super().__init__(env)
        assert num_envs % reset_ratio == 0, "reset_ratio must divide num_envs"
        self.num_envs = num_envs
        self.reset_ratio = reset_ratio
        self.num_resets = num_envs // reset_ratio

    # Key discipline chains split(key) per phase and fans out the second
    # half, exactly like craftax_wrappers.py:105-131 — required for bitwise
    # parity with reference env streams.
    def reset(self, key, params=None):
        key, _key = jax.random.split(key)
        keys = jax.random.split(_key, self.num_envs)
        return jax.vmap(self._env.reset_env, in_axes=(0, None))(keys, params)

    def step(self, key, state, action, params=None):
        key, _key = jax.random.split(key)
        step_keys = jax.random.split(_key, self.num_envs)
        obs_st, state_st, reward, done, info = jax.vmap(
            self._env.step_env, in_axes=(0, 0, 0, None)
        )(step_keys, state, action, params)

        key, _key = jax.random.split(key)
        reset_keys = jax.random.split(_key, self.num_resets)
        obs_re, state_re = jax.vmap(self._env.reset_env, in_axes=(0, None))(
            reset_keys, params
        )

        # Default slot map gives every env a reset slot; done envs chosen by
        # weighted sampling get dedicated distinct slots so simultaneous
        # resets are independent up to num_resets of them. `p=done` verbatim
        # (craftax_wrappers.py:125-131): when nothing is done the normalized
        # weights are NaN and the sampled slots are arbitrary, but the
        # gathered reset states are then fully discarded by the select.
        key, _key = jax.random.split(key)
        reset_indexes = jnp.arange(self.num_resets).repeat(self.reset_ratio)
        being_reset = jax.random.choice(
            _key,
            jnp.arange(self.num_envs),
            shape=(self.num_resets,),
            p=done,
            replace=False,
        )
        reset_indexes = reset_indexes.at[being_reset].set(
            jnp.arange(self.num_resets)
        )

        obs_re = jax.tree_util.tree_map(lambda x: x[reset_indexes], obs_re)
        state_re = jax.tree_util.tree_map(lambda x: x[reset_indexes], state_re)

        def select(re, st):
            d = done.reshape(done.shape + (1,) * (st.ndim - 1))
            return jnp.where(d, re, st)

        obs = jax.tree_util.tree_map(select, obs_re, obs_st)
        state = jax.tree_util.tree_map(select, state_re, state_st)
        return obs, state, reward, done, info


def _pack_rows(tree):
    """Flatten a pytree of (N, ...) arrays into TWO row-major buffers:
    (N, n8) int8 for 1-byte leaves and (N, n32) int32 for 4-byte leaves
    (floats bitcast — exact round trip). The reset bank lives packed so
    the per-step serve is 2 gathers instead of one per leaf: at 1024
    craftax-class envs the ~30 per-leaf (64,)-row gathers were each
    their own kernel dispatch, a measurable slice of a dispatch-bound
    env step."""
    leaves = jax.tree_util.tree_leaves(tree)
    n = leaves[0].shape[0]
    g8, g32 = [], []
    for x in leaves:
        flat = x.reshape(n, -1)
        if x.dtype == jnp.bool_:
            g8.append(flat.astype(jnp.int8))
        elif x.dtype.itemsize == 1:
            g8.append(jax.lax.bitcast_convert_type(flat, jnp.int8))
        elif x.dtype.itemsize == 4:
            if x.dtype == jnp.int32:
                g32.append(flat)
            else:
                g32.append(jax.lax.bitcast_convert_type(flat, jnp.int32))
        else:
            raise NotImplementedError(
                f"packed reset bank supports 1/4-byte leaves, got {x.dtype}"
            )
    w8 = (
        jnp.concatenate(g8, axis=1)
        if g8
        else jnp.zeros((n, 0), jnp.int8)
    )
    w32 = (
        jnp.concatenate(g32, axis=1)
        if g32
        else jnp.zeros((n, 0), jnp.int32)
    )
    return w8, w32


def _unpack_rows(w8, w32, like):
    """Inverse of `_pack_rows`: rebuild a pytree with `like`'s structure,
    leaf shapes/dtypes, and leading dim = the buffers' row count."""
    leaves, treedef = jax.tree_util.tree_flatten(like)
    n = w8.shape[0] if w8.size or not w32.size else w32.shape[0]
    o8 = o32 = 0
    out = []
    for x in leaves:
        tail = x.shape[1:]
        sz = 1
        for d in tail:
            sz *= d
        if x.dtype == jnp.bool_:
            seg = w8[:, o8 : o8 + sz]
            o8 += sz
            out.append(seg.astype(jnp.bool_).reshape((n,) + tail))
        elif x.dtype.itemsize == 1:
            seg = w8[:, o8 : o8 + sz]
            o8 += sz
            out.append(
                jax.lax.bitcast_convert_type(seg, x.dtype).reshape(
                    (n,) + tail
                )
            )
        else:
            seg = w32[:, o32 : o32 + sz]
            o32 += sz
            if x.dtype != jnp.int32:
                seg = jax.lax.bitcast_convert_type(seg, x.dtype)
            out.append(seg.reshape((n,) + tail))
    return jax.tree_util.tree_unflatten(treedef, out)


@struct.dataclass
class BankedResetState:
    env_state: Any    # (num_envs, ...) live env states
    bank_w8: jax.Array   # (bank_size, n8) packed 1-byte bank columns
    bank_w32: jax.Array  # (bank_size, n32) packed 4-byte bank columns
    cursor: jax.Array  # rotating refresh pointer into the bank
    tick: jax.Array    # step counter gating the periodic refresh burst


class BankedResetVecEnv(Wrapper):
    """OptimisticResetVecEnv with the worldgen amortized through a rolling
    reset bank: instead of computing num_envs/reset_ratio fresh resets
    EVERY step (64/step at the craftax config — measured ~6x the cost of
    the env step itself for procedural-worldgen envs), the wrapper keeps a
    bank of pre-generated reset states in the carried env state and serves
    the per-step reset candidates as cheap gathers from it. Every
    `refresh_every` steps a lax.cond-gated BURST regenerates num_resets
    bank rows at once — bursts, not a per-step trickle, because worldgen
    cost is dominated by kernel-launch overhead, not batch size (measured:
    4 worldgens cost ~as much as 64), so only skipping the whole program
    on most steps actually wins.

    Semantics: done envs receive distinct fresh worlds exactly like the
    optimistic wrapper (same `p=done` weighted routing,
    craftax_wrappers.py:125-131); the difference is only HOW fresh the
    candidate worlds are — bank rows are at most
    ~bank_size/num_resets*refresh_every steps old instead of 0. World
    diversity is num_resets/refresh_every fresh worlds per step (vs
    num_resets), still millions of distinct worlds per 1e9-step run.
    A non-parity, opt-in fast path (config RESET_BANK > 0), like
    FUSED_ROLLOUT: learning equivalence is verified empirically
    (tests/test_reset_bank.py, bench learning notes)."""

    def __init__(
        self,
        env: Environment,
        num_envs: int,
        reset_ratio: int,
        bank_size: int = 256,
        refresh_every: int = 16,
    ):
        super().__init__(env)
        assert num_envs % reset_ratio == 0
        self.num_envs = num_envs
        self.num_resets = num_envs // reset_ratio
        self.bank_size = bank_size
        self.refresh_every = refresh_every

    def reset(self, key, params=None):
        key, k_envs, k_bank = jax.random.split(key, 3)
        keys = jax.random.split(k_envs, self.num_envs)
        obs, env_state = jax.vmap(self._env.reset_env, in_axes=(0, None))(
            keys, params
        )
        bank_keys = jax.random.split(k_bank, self.bank_size)
        bank = jax.vmap(self._env.reset_env, in_axes=(0, None))(
            bank_keys, params
        )
        bank_w8, bank_w32 = _pack_rows(bank)
        state = BankedResetState(
            env_state=env_state,
            bank_w8=bank_w8,
            bank_w32=bank_w32,
            cursor=jnp.asarray(0, jnp.int32),
            tick=jnp.asarray(0, jnp.int32),
        )
        return obs, state

    def step(self, key, state, action, params=None):
        key, _key = jax.random.split(key)
        step_keys = jax.random.split(_key, self.num_envs)
        obs_st, env_st, reward, done, info = jax.vmap(
            self._env.step_env, in_axes=(0, 0, 0, None)
        )(step_keys, state.env_state, action, params)

        # refresh burst: every refresh_every steps regenerate num_resets
        # bank rows at rotating positions; lax.cond skips the whole
        # worldgen program on other steps
        key, _key = jax.random.split(key)

        def _refresh(operand):
            bank_w8, bank_w32, cursor = operand
            fresh_keys = jax.random.split(_key, self.num_resets)
            fresh = jax.vmap(self._env.reset_env, in_axes=(0, None))(
                fresh_keys, params
            )
            f8, f32 = _pack_rows(fresh)
            rows = (cursor + jnp.arange(self.num_resets)) % self.bank_size
            return (
                bank_w8.at[rows].set(f8),
                bank_w32.at[rows].set(f32),
                cursor + self.num_resets,
            )

        bank_w8, bank_w32, cursor = jax.lax.cond(
            state.tick % self.refresh_every == 0,
            _refresh,
            lambda op: op,
            (state.bank_w8, state.bank_w32, state.cursor),
        )

        # serve: num_resets candidates gathered from the bank
        key, _key = jax.random.split(key)
        cand = jax.random.randint(
            _key, (self.num_resets,), 0, self.bank_size
        )

        # route candidates to done envs — the same weighted sampling as
        # OptimisticResetVecEnv (craftax_wrappers.py:125-131), applied as
        # a scatter (see _scatter_resets for the >num_resets-dones trade)
        key, _key = jax.random.split(key)
        being_reset = jax.random.choice(
            _key,
            jnp.arange(self.num_envs),
            shape=(self.num_resets,),
            p=done,
            replace=False,
        )
        # ONE (num_resets,)-row gather per packed buffer, unpacked to the
        # candidate tree (pure slice/bitcast/reshape), then scattered onto
        # the done envs (O(num_resets) traffic; see _scatter_resets)
        cand_tree = _unpack_rows(bank_w8[cand], bank_w32[cand], (obs_st, env_st))
        obs, env_state = _scatter_resets(
            done, being_reset, cand_tree, (obs_st, env_st)
        )
        new_state = BankedResetState(
            env_state=env_state,
            bank_w8=bank_w8,
            bank_w32=bank_w32,
            cursor=cursor % self.bank_size,
            tick=state.tick + 1,
        )
        return obs, new_state, reward, done, info


class ScrubNaN(Wrapper):
    """Zero non-finite rewards and observations at the env boundary (the
    brax wrapper's NaN scrub, brax_wrappers.py:210-213 — "some envs might
    produce NaN rewards"). The reference warns through a debug callback;
    host callbacks are unavailable on some TPU runtimes, so the count of
    scrubbed values is reported in-graph via info["nan_events"] instead
    (a metric sink can alert on it; zero on healthy envs)."""

    def reset(self, key, params=None):
        obs, state = self._env.reset(key, params)
        obs = jax.tree_util.tree_map(
            lambda o: jnp.where(jnp.isfinite(o), o, 0.0), obs
        )
        return obs, state

    def step(self, key, state, action, params=None):
        obs, state, reward, done, info = self._env.step(
            key, state, action, params
        )
        bad_r = ~jnp.isfinite(reward)
        # per-env counts (same shape as reward) so the info entry
        # broadcasts against done-masked (T, E) metric aggregation
        bad_o = jax.tree_util.tree_reduce(
            lambda acc, o: acc
            + (~jnp.isfinite(o))
            .reshape(jnp.shape(reward) + (-1,))
            .sum(axis=-1),
            obs,
            jnp.zeros(jnp.shape(reward), jnp.int32),
        )
        reward = jnp.where(bad_r, 0.0, reward)
        obs = jax.tree_util.tree_map(
            lambda o: jnp.where(jnp.isfinite(o), o, 0.0), obs
        )
        info = dict(info)
        info["nan_events"] = bad_r.astype(jnp.int32) + bad_o
        return obs, state, reward, done, info


class ClipAction(Wrapper):
    """Clip continuous actions to [low, high] (brax_wrappers.py:275-290)."""

    def __init__(self, env: Environment, low: float = -1.0, high: float = 1.0):
        super().__init__(env)
        self.low = low
        self.high = high

    def step(self, key, state, action, params=None):
        action = jnp.clip(action, self.low, self.high)
        return self._env.step(key, state, action, params)


class TransformObservation(Wrapper):
    def __init__(self, env: Environment, transform_obs: Callable):
        super().__init__(env)
        self.transform_obs = transform_obs

    def reset(self, key, params=None):
        obs, state = self._env.reset(key, params)
        return self.transform_obs(obs), state

    def step(self, key, state, action, params=None):
        obs, state, reward, done, info = self._env.step(key, state, action, params)
        return self.transform_obs(obs), state, reward, done, info


class TransformReward(Wrapper):
    def __init__(self, env: Environment, transform_reward: Callable):
        super().__init__(env)
        self.transform_reward = transform_reward

    def step(self, key, state, action, params=None):
        obs, state, reward, done, info = self._env.step(key, state, action, params)
        return obs, state, self.transform_reward(reward), done, info


class VecEnv(Wrapper):
    """vmap reset/step with caller-provided per-env keys
    (brax_wrappers.py:317-321)."""

    def __init__(self, env: Environment):
        super().__init__(env)
        self.reset = jax.vmap(self._env.reset, in_axes=(0, None))
        self.step = jax.vmap(self._env.step, in_axes=(0, 0, 0, None))


@struct.dataclass
class NormalizeVecObsState:
    mean: jax.Array
    var: jax.Array
    count: jax.Array
    env_state: Any


class NormalizeVecObservation(Wrapper):
    """Running-mean/var observation normalization over the env batch using
    Welford/parallel-variance updates (brax_wrappers.py:335-508). Wraps a
    *vectorized* env (VecEnv/BatchEnv)."""

    def reset(self, key, params=None):
        obs, env_state = self._env.reset(key, params)
        state = NormalizeVecObsState(
            mean=jnp.zeros_like(obs[0]),
            var=jnp.ones_like(obs[0]),
            count=jnp.asarray(1e-4),
            env_state=env_state,
        )
        state, norm_obs = self._update_and_normalize(state, obs)
        return norm_obs, state

    def step(self, key, state, action, params=None):
        obs, env_state, reward, done, info = self._env.step(
            key, state.env_state, action, params
        )
        state = state.replace(env_state=env_state)
        state, norm_obs = self._update_and_normalize(state, obs)
        return norm_obs, state, reward, done, info

    def eval_step(self, key, state, action, params=None):
        """Normalize with frozen statistics (brax_wrappers.py:488-508)."""
        obs, env_state, reward, done, info = self._env.step(
            key, state.env_state, action, params
        )
        state = state.replace(env_state=env_state)
        norm_obs = (obs - state.mean) / jnp.sqrt(state.var + 1e-8)
        return norm_obs, state, reward, done, info

    @staticmethod
    def _update_and_normalize(state, obs):
        batch_mean = obs.mean(axis=0)
        batch_var = obs.var(axis=0)
        batch_count = obs.shape[0]

        delta = batch_mean - state.mean
        tot_count = state.count + batch_count
        new_mean = state.mean + delta * batch_count / tot_count
        m_a = state.var * state.count
        m_b = batch_var * batch_count
        m2 = m_a + m_b + jnp.square(delta) * state.count * batch_count / tot_count
        new_var = m2 / tot_count

        state = state.replace(mean=new_mean, var=new_var, count=tot_count)
        return state, (obs - new_mean) / jnp.sqrt(new_var + 1e-8)


@struct.dataclass
class NormalizeVecRewState:
    mean: jax.Array
    var: jax.Array
    count: jax.Array
    return_val: jax.Array
    env_state: Any


class NormalizeVecReward(Wrapper):
    """Normalize rewards by the running std of the discounted return
    (brax_wrappers.py:520-566). Wraps a vectorized env."""

    def __init__(self, env: Environment, gamma: float):
        super().__init__(env)
        self.gamma = gamma

    def reset(self, key, params=None):
        obs, env_state = self._env.reset(key, params)
        batch_count = obs.shape[0]
        state = NormalizeVecRewState(
            mean=jnp.asarray(0.0),
            var=jnp.asarray(1.0),
            count=jnp.asarray(1e-4),
            return_val=jnp.zeros((batch_count,)),
            env_state=env_state,
        )
        return obs, state

    def step(self, key, state, action, params=None):
        obs, env_state, reward, done, info = self._env.step(
            key, state.env_state, action, params
        )
        return_val = state.return_val * self.gamma * (1 - done) + reward

        batch_mean = return_val.mean()
        batch_var = return_val.var()
        batch_count = return_val.shape[0]

        delta = batch_mean - state.mean
        tot_count = state.count + batch_count
        new_mean = state.mean + delta * batch_count / tot_count
        m_a = state.var * state.count
        m_b = batch_var * batch_count
        m2 = m_a + m_b + jnp.square(delta) * state.count * batch_count / tot_count
        new_var = m2 / tot_count

        state = NormalizeVecRewState(
            mean=new_mean,
            var=new_var,
            count=tot_count,
            return_val=return_val,
            env_state=env_state,
        )
        return obs, state, reward / jnp.sqrt(new_var + 1e-8), done, info


@struct.dataclass
class LogVecState:
    env_state: Any
    episode_returns: jax.Array
    episode_lengths: jax.Array
    returned_episode_returns: jax.Array
    returned_episode_lengths: jax.Array
    timestep: jax.Array


class LogVec(Wrapper):
    """Batched episode accounting; also exposes the raw reward as
    `original_reward` so downstream reward transforms stay observable
    (brax_wrappers.py:579-629)."""

    def reset(self, key, params=None):
        obs, env_state = self._env.reset(key, params)
        n = jax.tree_util.tree_leaves(obs)[0].shape[0]
        state = LogVecState(
            env_state=env_state,
            episode_returns=jnp.zeros((n,)),
            episode_lengths=jnp.zeros((n,), jnp.int32),
            returned_episode_returns=jnp.zeros((n,)),
            returned_episode_lengths=jnp.zeros((n,), jnp.int32),
            timestep=jnp.asarray(0, jnp.int32),
        )
        return obs, state

    def step(self, key, state, action, params=None):
        obs, env_state, reward, done, info = self._env.step(
            key, state.env_state, action, params
        )
        new_episode_return = state.episode_returns + reward
        new_episode_length = state.episode_lengths + 1
        not_done = 1 - done
        state = LogVecState(
            env_state=env_state,
            episode_returns=new_episode_return * not_done,
            episode_lengths=new_episode_length * not_done.astype(jnp.int32),
            returned_episode_returns=state.returned_episode_returns * not_done
            + new_episode_return * done,
            returned_episode_lengths=state.returned_episode_lengths
            * not_done.astype(jnp.int32)
            + new_episode_length * done.astype(jnp.int32),
            timestep=state.timestep + 1,
        )
        info = dict(info)
        info["returned_episode_returns"] = state.returned_episode_returns
        info["returned_episode_lengths"] = state.returned_episode_lengths
        info["returned_episode"] = done
        info["timestep"] = jnp.broadcast_to(state.timestep, done.shape)
        info["original_reward"] = reward
        return obs, state, reward, done, info
