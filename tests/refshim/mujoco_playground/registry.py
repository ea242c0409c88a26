"""registry surface: get_default_config(name) / load(name, config)."""

from purejaxql_tpu.envs import make as _make_env

# playground task name -> in-tree env name (all with [-1,1] action boxes)
_NAME_MAP = {
    "PointMass": "PointMass-v0",
    "CartpoleBalance": "CartpoleBalance-v0",
    "CheetahRun": "CheetahRun-v0",
}


class _Config:
    def __init__(self, episode_length, action_repeat=1):
        self.episode_length = episode_length
        self.action_repeat = action_repeat


def get_default_config(env_name):
    env, params = _load_raw(env_name)
    return _Config(int(getattr(params, "max_steps_in_episode", 1000)))


def _load_raw(env_name):
    return _make_env(_NAME_MAP.get(env_name, env_name))


def load(env_name, config=None):
    env, params = _load_raw(env_name)
    return env
