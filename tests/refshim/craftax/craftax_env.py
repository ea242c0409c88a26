"""craftax-API shim backed by the in-tree Forager env, so the unmodified
reference craftax scripts (pqn_craftax.py:24,96-98) run in-image. The
reference constructs the env with ``auto_reset=not USE_OPTIMISTIC_RESETS``
— craftax envs expose raw (non-resetting) reset/step in that mode and its
OptimisticResetVecEnvWrapper manages resets itself."""

from purejaxql_tpu.envs import make as _make_env


class _RawResetView:
    """Expose the env's raw reset_env/step_env as reset/step
    (= a craftax env created with auto_reset=False)."""

    def __init__(self, env):
        self._env = env

    def __getattr__(self, name):
        return getattr(self._env, name)

    def reset(self, key, params=None):
        if params is None:
            params = self._env.default_params
        return self._env.reset_env(key, params)

    def step(self, key, state, action, params=None):
        if params is None:
            params = self._env.default_params
        return self._env.step_env(key, state, action, params)


def make_craftax_env_from_name(name, auto_reset=True):
    env, _ = _make_env(name)
    return env if auto_reset else _RawResetView(env)
