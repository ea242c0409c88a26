"""gymnax-API shim backed by purejaxql_tpu's in-tree environments.

Exposes exactly what the reference scripts import
(/root/reference/purejaxql/pqn_gymnax.py:20,25): ``gymnax.make`` plus the
``gymnax.wrappers.purerl`` wrapper pair. The returned env objects follow the
gymnax functional protocol (reset(key, params) / step(key, state, action,
params) with auto-reset), which purejaxql_tpu.envs.base.Environment
implements natively, so the reference engine runs on them unmodified.
"""

from purejaxql_tpu.envs import make as _make_env

from . import wrappers  # noqa: F401


def make(env_id, **env_kwargs):
    """gymnax.make(env_id) -> (env, default_params)."""
    return _make_env(env_id, **env_kwargs)
