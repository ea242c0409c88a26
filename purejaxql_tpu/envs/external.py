"""Ecosystem adapters: resolve env names through installed external
packages (gymnax, craftax, jaxmarl) when they exist.

The in-tree registry serves this framework's own environments; when the
actual benchmark suites the reference trains on are pip-installed
(gymnax for classic control, craftax, jaxmarl for MARL —
/root/reference/purejaxql/pqn_gymnax.py:92, pqn_craftax.py:96,
pqn_vdn_rnn_jaxmarl.py:654), these adapters let the SAME configs train on
the real suites: `make()` falls through to them for names the in-tree
registry doesn't know (in-tree names always win, so in-image behavior is
unchanged).

The adapters are thin by design — this package's Environment /
MultiAgentEnv protocols were built to match the gymnax / jaxmarl call
signatures (envs/base.py docstring), so adaptation is delegation plus
space conversion. They are exercised in CI against faithful fakes
injected into sys.modules (tests/test_external_adapters.py) since the
real packages are not installable in this image.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


def _convert_space(sp) -> spaces.Space:
    """Map a gymnax-style space object onto the in-tree space classes."""
    n = getattr(sp, "n", None)
    if n is not None:
        return spaces.Discrete(int(n))
    shape = tuple(getattr(sp, "shape", ()) or ())
    low = getattr(sp, "low", -np.inf)
    high = getattr(sp, "high", np.inf)
    dtype = getattr(sp, "dtype", np.float32)
    return spaces.Box(low, high, shape, dtype)


class GymnaxAdapter(Environment):
    """Wrap a gymnax(-like) env into the in-tree Environment protocol.

    gymnax environments already split reset_env/step_env with auto-reset
    composed in Environment.step, exactly like this package — delegation
    is 1:1. Works for craftax environments too (same protocol)."""

    def __init__(self, ext_env):
        self._ext = ext_env

    @property
    def default_params(self):
        return self._ext.default_params

    @property
    def name(self) -> str:
        return getattr(self._ext, "name", type(self._ext).__name__)

    def reset_env(self, key, params):
        return self._ext.reset_env(key, params)

    def step_env(self, key, state, action, params):
        obs, state, reward, done, info = self._ext.step_env(
            key, state, action, params
        )
        return obs, state, reward, done, dict(info)

    def observation_space(self, params):
        return _convert_space(self._ext.observation_space(params))

    def action_space(self, params=None):
        try:
            sp = self._ext.action_space(params)
        except TypeError:  # some suites take no params
            sp = self._ext.action_space()
        return _convert_space(sp)


def resolve_external(env_name: str, **env_kwargs) -> Optional[Tuple[Environment, object]]:
    """Try the installed ecosystem packages for `env_name`; None if no
    provider resolves it (caller then raises the unknown-env error)."""
    # ---- gymnax ---------------------------------------------------------
    try:
        import gymnax  # type: ignore

        try:
            env, params = gymnax.make(env_name, **env_kwargs)
            return GymnaxAdapter(env), params
        except Exception:
            pass
    except ImportError:
        pass

    # ---- craftax --------------------------------------------------------
    if env_name.startswith("Craftax"):
        try:
            from craftax import make_craftax_env_from_name  # type: ignore

            try:
                env = make_craftax_env_from_name(
                    env_name, auto_reset=False, **env_kwargs
                )
                return GymnaxAdapter(env), env.default_params
            except Exception:
                pass
        except ImportError:
            pass

    return None


def resolve_external_marl(env_name: str, **kwargs):
    """MARL fallback: jaxmarl envs already speak this package's
    MultiAgentEnv protocol (agents/num_agents, dict obs/actions,
    rewards/dones with "__all__", get_avail_actions) — return them
    directly. None when jaxmarl is absent or doesn't know the name."""
    try:
        import jaxmarl  # type: ignore
    except ImportError:
        return None
    try:
        return jaxmarl.make(env_name, **kwargs)
    except Exception:
        return None
